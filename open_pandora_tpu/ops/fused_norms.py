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

from open_pandora_tpu.core import flags

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


# -- streaming variant: slabs too large for VMEM residency ------------------
#
# The resident kernel needs the whole (L, C) sample slab in VMEM; the
# UNet3D's TemporalConvBlock norms run at (b, t*h*w, C) slabs up to 26 MB
# (level-0: 40960 x 320) and the level-0 decoder concat norms at 640/960
# channels — 79 of the 166 GN sites per CFG-pair eval, worth ~50 ms on the
# XLA path (fp32 upcast + strided convert_reduce, measured round 3 via
# utils/xplane.py). Streaming form: two grid passes over row chunks —
# per-chunk fp32 partial moments to HBM (tiny), fold to group stats in XLA
# (N*C elements), then a normalize+SiLU pass. HBM traffic = 2 reads +
# 1 write of the bf16 slab, vs the XLA twin's fp32 round-trips.


def _stats_kernel(x_ref, m1_ref, m2_ref):
    xi = x_ref[0].astype(jnp.float32)                      # (chunk, C)
    m1_ref[0, 0, 0] = jnp.sum(xi, axis=0)
    m2_ref[0, 0, 0] = jnp.sum(xi * xi, axis=0)


def _apply_kernel(x_ref, k_ref, b_ref, o_ref, *, silu: bool):
    xi = x_ref[0].astype(jnp.float32)
    y = xi * k_ref[0] + b_ref[0]
    if silu:
        y = y * jnp.reciprocal(1.0 + jnp.exp(-y))
    o_ref[0] = y.astype(o_ref.dtype)


# chunk budget: bf16 in + bf16 out + fp32 temp per chunk ~8 B/elem; keep
# chunks ~2 MB of payload so double buffering hides the HBM latency
_STREAM_CHUNK_ELEMS = 2 ** 20


def _stream_chunk(L: int, C: int) -> int:
    """Largest divisor of L within the chunk budget that tiles cleanly
    (sublane rule: block rows divisible by 8, or the whole L)."""
    target = max(_STREAM_CHUNK_ELEMS // C, 1)
    best = 0
    for c in range(1, min(target, L) + 1):
        if L % c == 0 and (c % 8 == 0 or c == L):
            best = c
    return best


def _streaming_forward(x3, scale, bias, *, groups: int, eps: float,
                       silu: bool):
    N, L, C = x3.shape
    chunk = _stream_chunk(L, C)
    K = L // chunk
    m1, m2 = pl.pallas_call(
        _stats_kernel,
        grid=(N, K),
        in_specs=[pl.BlockSpec((1, chunk, C), lambda n, k: (n, k, 0))],
        # trailing singleton axis keeps the block's last-two dims equal to
        # the array's (TPU sublane/lane tiling rule)
        out_specs=[pl.BlockSpec((1, 1, 1, C), lambda n, k: (n, k, 0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((N, K, 1, C), jnp.float32)] * 2,
    )(x3)

    # fold partials to group stats (tiny: N*K*C fp32)
    cg = C // groups
    n_elems = float(L * cg)
    s1 = m1.sum(axis=(1, 2)).reshape(N, groups, cg).sum(axis=-1)   # (N, G)
    s2 = m2.sum(axis=(1, 2)).reshape(N, groups, cg).sum(axis=-1)
    mu_g = s1 / n_elems
    inv_g = jax.lax.rsqrt(jnp.maximum(s2 / n_elems - mu_g * mu_g, 0.0) + eps)
    mu_c = jnp.repeat(mu_g, cg, axis=1)                        # (N, C)
    inv_c = jnp.repeat(inv_g, cg, axis=1)
    k = inv_c * scale[None].astype(jnp.float32)
    b = bias[None].astype(jnp.float32) - mu_c * k

    return pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        grid=(N, K),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda n, kk: (n, kk, 0)),
            pl.BlockSpec((1, 1, C), lambda n, kk: (n, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda n, kk: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, C), lambda n, kk: (n, kk, 0)),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
    )(x3, k[:, None], b[:, None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _streaming_gn(x3, scale, bias, groups, eps, silu):
    return _streaming_forward(x3, scale, bias, groups=groups, eps=eps,
                              silu=silu)


def _streaming_gn_fwd(x3, scale, bias, groups, eps, silu):
    return (_streaming_forward(x3, scale, bias, groups=groups, eps=eps,
                               silu=silu),
            (x3, scale, bias))


_streaming_gn.defvjp(_streaming_gn_fwd, _fused_gn_bwd)


# -- MXU-stats XLA variant: bf16 fallback sites -----------------------------
#
# Round-3 xplane data: the fp32 XLA twin at the non-resident sites (the 5D
# TemporalConvBlock norms) costs ~33 ms/CFG-pair eval — the fp32 upcast
# reduce (convert_reduce) plus materialized fp32 keepdims-broadcasts of the
# stats over the whole slab. This variant computes the raw moments as two
# MXU matvecs over the bf16 slab (ones @ x, ones @ x*x with fp32
# accumulation — no fp32 slab ever exists), folds them to per-(N, C)
# affine coefficients in fp32 scalar math, and normalizes in one fused
# elementwise pass. The second-moment pass is CENTERED on the bf16-rounded
# group mean (var = E[(x-mu_hat)^2] + (mu-mu_hat)^2, the correction being
# O(2^-18 mu^2) ~ negligible), so there is no E[x^2]-mu^2 cancellation and
# the variance error stays at the ~2^-9/sqrt(n) bf16-squaring floor even
# for large mu/sigma. Streaming-Pallas comparison (v5e, 320x512x16f):
# Pallas two-pass REGRESSED to 324 ms (slab re-read + lost
# producer/consumer fusion); this form keeps everything inside XLA fusions.


def _mxu_group_norm(x, scale, bias, *, num_groups: int, eps: float,
                    silu: bool):
    N, C = x.shape[0], x.shape[-1]
    x3 = x.reshape(N, -1, C)
    L = x3.shape[1]
    cg = C // num_groups
    ones = jnp.ones((L,), x.dtype)
    dn = (((0,), (1,)), ((), ()))  # contract L; output (N, C)
    n_elems = float(L * cg)
    s1 = jax.lax.dot_general(ones, x3, dn,
                             preferred_element_type=jnp.float32)
    mu_g = s1.reshape(N, num_groups, cg).sum(-1) / n_elems     # (N, G)
    mu_c = jnp.repeat(mu_g, cg, axis=1)                        # (N, C)
    d = x3 - mu_c[:, None].astype(x.dtype)
    s2 = jax.lax.dot_general(ones, d * d, dn,
                             preferred_element_type=jnp.float32)
    var_g = s2.reshape(N, num_groups, cg).sum(-1) / n_elems
    inv = jax.lax.rsqrt(var_g + eps)
    inv_c = jnp.repeat(inv, cg, axis=1)                        # (N, C)
    k = inv_c * scale[None].astype(jnp.float32)
    b = bias[None].astype(jnp.float32) - mu_c * k
    y = x3.astype(jnp.float32) * k[:, None] + b[:, None]
    if silu:
        y = y * jnp.reciprocal(1.0 + jnp.exp(-y))
    return y.astype(x.dtype).reshape(x.shape)


def _on_tpu() -> bool:
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform == "tpu"
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _fused_gn_available() -> bool:

    if flags.flag("PANDORA_DISABLE_FUSED") or \
            flags.flag("PANDORA_DISABLE_FUSED_GN"):
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
    basic = x.ndim >= 3 and C % num_groups == 0 and x.dtype == jnp.bfloat16
    resident = basic and L * C <= _MAX_SLAB_ELEMS
    # Streaming is OPT-IN (PANDORA_STREAMING_GN=1): measured on v5e at
    # 320x512x16f the full CFG-pair eval REGRESSED to 324 ms vs ~290 ms with
    # the XLA fallback — the two grid passes re-read the slab from HBM and
    # lose the fusion XLA gets by folding the (upcast) stats into neighbor
    # ops. Kept for wider-slab regimes where fp32 round-trips dominate.
    streaming = (basic and not resident
                 and flags.flag("PANDORA_STREAMING_GN")
                 and _stream_chunk(L, C) * C >= _STREAM_CHUNK_ELEMS // 8)
    if force:  # tests: True -> resident kernel, "streaming" -> streaming
        ok = x.ndim >= 3 and C % num_groups == 0
        resident = ok and force != "streaming"
        streaming = ok and force == "streaming"
    elif not ((resident or streaming) and _fused_gn_available()):
        if basic and _fused_gn_available():
            # non-resident bf16 sites on TPU: MXU-stats XLA form instead of
            # the fp32-upcast twin (see _mxu_group_norm rationale above)
            return _mxu_group_norm(x, scale, bias, num_groups=num_groups,
                                   eps=eps, silu=silu)
        return _xla_group_norm(x, scale, bias, num_groups=num_groups,
                               eps=eps, silu=silu)
    x3 = x.reshape(x.shape[0], L, C)
    if resident:
        out = _fused_gn(x3, scale, bias, num_groups, eps, silu)
    else:
        out = _streaming_gn(x3, scale, bias, num_groups, eps, silu)
    return out.reshape(x.shape)
