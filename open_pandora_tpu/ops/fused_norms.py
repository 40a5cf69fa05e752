"""Fused GroupNorm(+SiLU) Pallas kernel for the UNet3D ResBlock path.

Why: the reference runs GN through cuDNN + pointwise CUDA kernels
(openaimodel3d.py:112-240 in_layers/out_layers; basics.py:76-88 fp32-stat
GroupNorm). On TPU the XLA lowering is two passes over the activation
(reduce for stats, then normalize+affine+SiLU), i.e. 2 reads + 1 write of
a tensor that at the 320x512 level-0 shape is ~100 MB across the (b·t)=32
frames — and round-1 profiling put the GN-bound ResBlock chain at ~95 ms
of the 268 ms CFG-pair UNet eval. This kernel holds one frame's (L, C)
slab in VMEM and does stats + normalize + SiLU in a single read+write.

Group statistics without lane-dim reshapes: per-channel sums (axis 0
reduction keeps C on lanes), then a (C, G) one-hot assignment matmul folds
channels into group moments and its transpose broadcasts them back — MXU
work measured in microseconds, no relayouts.

Training-safe: wrapped in jax.custom_vjp whose backward recomputes the
XLA twin (ops/norms.py group_norm) and differentiates that — the fused
kernel only ever serves forward passes.

Gating (mirrors ops/fused_temporal.py): TPU backend, bf16 activations
(golden fp32 mode keeps the exact two-pass XLA path), per-sample slab
small enough for double-buffered VMEM residency; everything else falls
back to ops/norms.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_pandora_tpu.ops.norms import group_norm as _xla_group_norm

# double-buffered bf16 in+out slabs must fit VMEM: 4 * L*C * 2B <= ~12 MB
_MAX_SLAB_ELEMS = 2 ** 21


def _kernel(x_ref, s_ref, b_ref, o_ref, *, groups: int, eps: float,
            silu: bool):
    x = x_ref[0]                                   # (L, C)
    xf = x.astype(jnp.float32)
    L, C = xf.shape
    cg = C // groups

    s1 = jnp.sum(xf, axis=0, keepdims=True)        # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)   # (1, C)

    # channel -> group one-hot (C, G); group moments via MXU
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    M = (ch // cg == gr).astype(jnp.float32)
    n = float(L * cg)
    mu_g = jax.lax.dot(s1, M, preferred_element_type=jnp.float32) / n
    ex2_g = jax.lax.dot(s2, M, preferred_element_type=jnp.float32) / n
    inv_g = jax.lax.rsqrt(jnp.maximum(ex2_g - mu_g * mu_g, 0.0) + eps)

    # broadcast back to channels: (1, G) @ (G, C)
    mu_c = jax.lax.dot(mu_g, M.T, preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot(inv_g, M.T, preferred_element_type=jnp.float32)

    y = (xf - mu_c) * inv_c * s_ref[0].astype(jnp.float32) \
        + b_ref[0].astype(jnp.float32)
    if silu:
        y = y * jnp.reciprocal(1.0 + jnp.exp(-y))
    o_ref[0] = y.astype(o_ref.dtype)


def _fused_forward(x3, scale, bias, *, groups: int, eps: float, silu: bool):
    N, L, C = x3.shape
    return pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, silu=silu),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
    )(x3, scale[None], bias[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_gn(x3, scale, bias, groups, eps, silu):
    return _fused_forward(x3, scale, bias, groups=groups, eps=eps, silu=silu)


def _fused_gn_fwd(x3, scale, bias, groups, eps, silu):
    return (_fused_forward(x3, scale, bias, groups=groups, eps=eps,
                           silu=silu),
            (x3, scale, bias))


def _fused_gn_bwd(groups, eps, silu, res, g):
    x3, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _xla_group_norm(xx, ss, bb, num_groups=groups,
                                           eps=eps, silu=silu),
        x3, scale, bias)
    return vjp(g)


_fused_gn.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def _on_tpu() -> bool:
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform == "tpu"
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _fused_gn_available() -> bool:
    import os

    if os.environ.get("PANDORA_DISABLE_FUSED"):
        return False
    return _on_tpu()


def fused_group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    force: Optional[bool] = None,
) -> jnp.ndarray:
    """GroupNorm(+SiLU) over channel-last x (N, ..., C), stats per sample
    over all middle dims. Routes to the Pallas kernel when eligible, else
    the XLA twin. `force=True` skips availability gating (tests)."""
    C = x.shape[-1]
    L = 1
    for d in x.shape[1:-1]:
        L *= d
    eligible = (
        x.ndim >= 3
        and C % num_groups == 0
        and L * C <= _MAX_SLAB_ELEMS
        and x.dtype == jnp.bfloat16
    )
    if force:
        eligible = x.ndim >= 3 and C % num_groups == 0
    elif not (eligible and _fused_gn_available()):
        return _xla_group_norm(x, scale, bias, num_groups=num_groups,
                               eps=eps, silu=silu)
    x3 = x.reshape(x.shape[0], L, C)
    out = _fused_gn(x3, scale, bias, num_groups, eps, silu)
    return out.reshape(x.shape)
