"""Batch-tiled attention for TINY sequence lengths (temporal t=16 sites).

The UNet3D's factorized temporal attention (reference DynamiCrafter
lvdm/modules/attention.py:365-412) runs N = M = t = 16 attention over a
HUGE batch (b*h*w = 9216 rows at 576x1024, heads 5-20). The XLA lowering
materializes the fp32 score tensor (B, H, N, M) in HBM with a (..., 16, 16)
minor layout that pads 8x on TPU (f32[9216,5,16,16] -> 360 MB per buffer,
measured in the 576x1024 train-step OOM dump) — the single largest class
of allocation in the hi-res training step.

This kernel keeps scores entirely in VMEM: the batch*heads axis is tiled
onto lanes, N/M/D live in sublanes, and each grid step computes the full
(N, M, lane-tile) softmax-attention in registers. Nothing of size
B*H*N*M ever touches HBM, in forward OR backward (custom-VJP Pallas
backward recomputes scores from q/k/v the same way — flash-attention's
trick, applied at the opposite extreme of the shape space).

Layout: (B, N, H, D) inputs are transposed once in XLA to (N, D, H*B)
so the kernel's minor-most axis is the huge batch — lane-dense, zero
padding waste. FLOPs run on the VPU (MXU would be ~2% utilized at 16x16
matmul shapes; the op is bandwidth-bound regardless).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128

# VMEM budget for picking the lane-tile width: double-buffered bf16 in/out
# tiles + fp32 casts + the (N, M, bt) score stack + per-row (M, D, bt) temps.
_VMEM_BUDGET = 10 * 2 ** 20


def _tile_bytes(n: int, m: int, d: int, bt: int, itemsize: int,
                bwd: bool) -> int:
    io = (3 + 1) * n * d * bt * itemsize * 2        # q,k,v,o double-buffered
    f32 = 3 * n * d * bt * 4                        # fp32 casts
    scores = 2 * n * m * bt * 4                     # s + p
    temp = m * d * bt * 4                           # per-row reduction temp
    if bwd:
        io += 4 * n * d * bt * itemsize * 2         # do in, dq/dk/dv out
        f32 += 4 * n * d * bt * 4
        scores += 2 * n * m * bt * 4                # dp + ds
    return io + f32 + scores + temp


def _pick_bt(n: int, m: int, d: int, itemsize: int, bwd: bool) -> int:
    for bt in (1024, 512, 256, LANES):
        if _tile_bytes(n, m, d, bt, itemsize, bwd) <= _VMEM_BUDGET:
            return bt
    return LANES


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # refs: (N, D, bt) q / o, (M, D, bt) k / v
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    n = q.shape[0]
    # scores (N, M, bt): per-n reduction keeps the (M, D, bt) temp small
    s = jnp.stack([jnp.sum(q[i][None] * k, axis=1) for i in range(n)])
    s = s * scale
    p = jax.nn.softmax(s, axis=1)
    o = jnp.stack([jnp.sum(p[i][:, None] * v, axis=0) for i in range(n)])
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    n = q.shape[0]
    s = jnp.stack([jnp.sum(q[i][None] * k, axis=1) for i in range(n)])
    p = jax.nn.softmax(s * scale, axis=1)                      # (N, M, bt)
    # dv[m] = sum_n p[n,m] * do[n]
    dv = sum(p[i][:, None] * do[i][None] for i in range(n))    # (M, D, bt)
    # dp[n,m] = sum_d do[n,d] * v[m,d]
    dp = jnp.stack([jnp.sum(do[i][None] * v, axis=1) for i in range(n)])
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True)) * scale
    dq = jnp.stack([jnp.sum(ds[i][:, None] * k, axis=0) for i in range(n)])
    dk = sum(ds[i][:, None] * q[i][None] for i in range(n))
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _to_lanes(x: jnp.ndarray, pad_to: int) -> jnp.ndarray:
    """(B, N, H, D) -> (N, D, H*B) with the batch axis padded to the lane
    tile (one XLA copy; fused transpose+reshape)."""
    b, n, h, d = x.shape
    xt = jnp.transpose(x, (1, 3, 2, 0)).reshape(n, d, h * b)
    if pad_to != h * b:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad_to - h * b)))
    return xt


def _from_lanes(xt: jnp.ndarray, b: int, h: int) -> jnp.ndarray:
    n, d, _ = xt.shape
    xt = xt[:, :, : h * b].reshape(n, d, h, b)
    return jnp.transpose(xt, (3, 0, 2, 1))


def _run_fwd(qt, kt, vt, scale, bt):
    n, d, j = qt.shape
    m = kt.shape[0]
    grid = (j // bt,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, d, bt), lambda i: (0, 0, i)),
            pl.BlockSpec((m, d, bt), lambda i: (0, 0, i)),
            pl.BlockSpec((m, d, bt), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((n, d, bt), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n, d, j), qt.dtype),
    )(qt, kt, vt)


def _run_bwd(qt, kt, vt, dot, scale, bt):
    n, d, j = qt.shape
    m = kt.shape[0]
    grid = (j // bt,)
    kv_spec = pl.BlockSpec((m, d, bt), lambda i: (0, 0, i))
    q_spec = pl.BlockSpec((n, d, bt), lambda i: (0, 0, i))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, d, j), qt.dtype),
            jax.ShapeDtypeStruct((m, d, j), qt.dtype),
            jax.ShapeDtypeStruct((m, d, j), qt.dtype),
        ],
    )(qt, kt, vt, dot)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _small_attn(q, k, v, scale):
    out, _ = _small_attn_fwd(q, k, v, scale)
    return out


def _small_attn_fwd(q, k, v, scale):
    b, n, h, d = q.shape
    bt = _pick_bt(n, k.shape[1], d, q.dtype.itemsize, bwd=False)
    j = -(-(h * b) // bt) * bt
    out = _run_fwd(_to_lanes(q, j), _to_lanes(k, j), _to_lanes(v, j),
                   scale, bt)
    return _from_lanes(out, b, h), (q, k, v)


def _small_attn_bwd(scale, res, do):
    q, k, v = res
    b, n, h, d = q.shape
    bt = _pick_bt(n, k.shape[1], d, q.dtype.itemsize, bwd=True)
    j = -(-(h * b) // bt) * bt
    dq, dk, dv = _run_bwd(_to_lanes(q, j), _to_lanes(k, j), _to_lanes(v, j),
                          _to_lanes(do, j), scale, bt)
    return (_from_lanes(dq, b, h), _from_lanes(dk, b, h),
            _from_lanes(dv, b, h))


_small_attn.defvjp(_small_attn_fwd, _small_attn_bwd)

# padded tiny-seq tiles keep sublane counts sane up to ~32; beyond that the
# flash kernel's sequence tiling is the right tool
_MAX_SEQ = 32


def small_attention_eligible(n: int, m: int, batch_heads: int) -> bool:
    """Shapes this kernel targets: both sequence lengths tiny, batch*heads
    at least one lane tile wide."""
    return n <= _MAX_SEQ and m <= _MAX_SEQ and batch_heads >= LANES


def small_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention for (B, N, H, D) q and (B, M, H, D) k/v with N, M tiny and
    B huge. Softmax statistics fp32; differentiable (Pallas backward)."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else d ** -0.5
    return _small_attn(q, k, v, scale)
