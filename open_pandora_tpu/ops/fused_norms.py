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

# bf16 in+out slabs (double-buffered) + per-chunk fp32 temps must fit
# ~16 MB VMEM: ~8 bytes/element of slab + slack
_MAX_SLAB_ELEMS = 3 * 2 ** 19


def _row_chunk(L: int, C: int) -> int:
    """Largest divisor of L whose fp32 chunk (rows x C) stays <= 0.5 MB —
    keeps the kernel's per-chunk temps small relative to the slab
    (static, host-side)."""
    target = max(min(131072 // C, L), 8)
    best = 1
    for c in range(1, min(target, L) + 1):
        if L % c == 0:
            best = c
    return best


def _kernel(x_ref, s_ref, b_ref, o_ref, m1_scr, m2_scr, *, groups: int,
            eps: float, silu: bool, chunk: int):
    """Two chunked passes over the VMEM-resident (L, C) slab: accumulate
    per-channel moments, fold to group stats via a one-hot matmul, then
    normalize+affine+SiLU chunk-by-chunk. fp32 temps exist only at chunk
    granularity, so VMEM stays ~2 bytes/element + O(chunk*C)."""
    L, C = x_ref.shape[1], x_ref.shape[2]
    cg = C // groups
    n_chunks = L // chunk

    def acc(i, _):
        xi = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        m1_scr[...] += jnp.sum(xi, axis=0, keepdims=True)
        m2_scr[...] += jnp.sum(xi * xi, axis=0, keepdims=True)
        return 0

    m1_scr[...] = jnp.zeros_like(m1_scr)
    m2_scr[...] = jnp.zeros_like(m2_scr)
    jax.lax.fori_loop(0, n_chunks, acc, 0)

    # channel -> group one-hot (C, G); group moments via MXU
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    M = (ch // cg == gr).astype(jnp.float32)
    n = float(L * cg)
    mu_g = jax.lax.dot(m1_scr[...], M, preferred_element_type=jnp.float32) / n
    ex2_g = jax.lax.dot(m2_scr[...], M, preferred_element_type=jnp.float32) / n
    inv_g = jax.lax.rsqrt(jnp.maximum(ex2_g - mu_g * mu_g, 0.0) + eps)

    # broadcast back to channels: (1, G) @ (G, C), fold in scale/bias
    mu_c = jax.lax.dot(mu_g, M.T, preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot(inv_g, M.T, preferred_element_type=jnp.float32)
    k = inv_c * s_ref[0].astype(jnp.float32)           # (1, C)
    b = b_ref[0].astype(jnp.float32) - mu_c * k

    def norm(i, _):
        xi = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xi * k + b
        if silu:
            y = y * jnp.reciprocal(1.0 + jnp.exp(-y))
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm, 0)


def _fused_forward(x3, scale, bias, *, groups: int, eps: float, silu: bool):
    N, L, C = x3.shape
    return pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, silu=silu,
                          chunk=_row_chunk(L, C)),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
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

    if os.environ.get("PANDORA_DISABLE_FUSED") or \
            os.environ.get("PANDORA_DISABLE_FUSED_GN"):
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
