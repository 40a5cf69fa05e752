"""Fused temporal self-attention block: LayerNorm + QKV projection +
block-diagonal packed t=16 attention + output projection + residual add,
in ONE Pallas kernel.

Why: the UNet3D's temporal transformer sites are memory-bound — each XLA op
(LN, q/k/v GEMMs, tiny t x t attention, out GEMM) re-reads the ~100 MB
activation from HBM, and the 16x16x64 attention matmuls run at <1% MXU.
Measured on v5e at the level-0 shape (81920 tokens, c=320): ~5 ms for the
XLA chain vs ~0.7 ms roofline. This kernel reads the residual stream once,
keeps the (c, inner) weights resident in VMEM (constant index_map), packs
G positions' t-token attentions into full MXU tiles with a block-diagonal
mask, and writes `y + Wo @ attn` once.

Scope: inference fast path for c == inner <= 640 (weights must fit VMEM);
training and larger channels use the XLA twin in models/unet3d.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_pandora_tpu.core import flags

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(y_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, g_ref, b_ref,
            o_ref, *, t: int, heads: int, dh: int, sm_scale: float,
            eps: float, tmajor: bool = False):
    if tmajor:
        # native-layout variant: block is (1, t, G, c) straight out of the
        # (B, t, HW, c) residual stream — rows are t-major (row = ti*G + p),
        # so a temporal sequence is the stride-G comb {p, G+p, 2G+p, ...}
        blk = y_ref[0]           # (t, G, c)
        t_, G = blk.shape[0], blk.shape[1]
        y = blk.reshape(t_ * G, blk.shape[2])
    else:
        y = y_ref[0]  # (G*t, c)
    n, c = y.shape

    # LayerNorm (fp32 stats)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=1, keepdims=True)
    xn = ((yf - mu) / jnp.sqrt(var + eps)) * g_ref[0].astype(jnp.float32) \
        + b_ref[0].astype(jnp.float32)
    xn = xn.astype(y.dtype)

    q = jax.lax.dot(xn, wq_ref[...], preferred_element_type=jnp.float32)
    k = jax.lax.dot(xn, wk_ref[...], preferred_element_type=jnp.float32)
    v = jax.lax.dot(xn, wv_ref[...], preferred_element_type=jnp.float32)
    q = q.astype(y.dtype)
    k = k.astype(y.dtype)
    v = v.astype(y.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    if tmajor:
        g = n // t
        mask = (row % g) == (col % g)   # same spatial position
    else:
        mask = (row // t) == (col // t)

    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(mask, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        outs.append(jax.lax.dot(p.astype(v.dtype), v[:, sl],
                                preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=1).astype(y.dtype)
    out = jax.lax.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    out = out + bo_ref[0].astype(jnp.float32)
    res = (y.astype(jnp.float32) + out).astype(o_ref.dtype)
    o_ref[0] = res.reshape(o_ref.shape[1:]) if tmajor else res


def fused_temporal_self_attention(
    y: jnp.ndarray,          # (B, t, c) residual stream (B = b*h*w)
    wq: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray,  # (c, inner)
    wo: jnp.ndarray, bo: jnp.ndarray,                   # (inner, c), (c,)
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,        # (c,)
    *, heads: int, eps: float = 1e-5, group: int = 32,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Returns y + to_out(attn(LN(y))) with self-attention over the t axis.
    Requires c == inner (true for all UNet temporal sites except init_attn's
    512-wide inner — callers check)."""
    B, t, c = y.shape
    inner = wq.shape[1]
    dh = inner // heads
    scale = sm_scale if sm_scale is not None else dh ** -0.5

    G = group
    n_pad = (-B) % G
    yp = jnp.pad(y, ((0, n_pad), (0, 0), (0, 0))) if n_pad else y
    n_groups = (B + n_pad) // G
    yg = yp.reshape(n_groups, G * t, c)

    const = lambda i: (0, 0)
    const1 = lambda i: (0,)
    out = pl.pallas_call(
        functools.partial(_kernel, t=t, heads=heads, dh=dh,
                          sm_scale=float(scale), eps=eps),
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, G * t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, inner), const),
            pl.BlockSpec((c, inner), const),
            pl.BlockSpec((c, inner), const),
            pl.BlockSpec((inner, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
        ],
        out_specs=pl.BlockSpec((1, G * t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(yg.shape, y.dtype),
    )(yg, wq, wk, wv, wo, bo[None], ln_scale[None], ln_bias[None])

    out = out.reshape(-1, t, c)
    return out[:B] if n_pad else out


def fused_temporal_self_attention_native(
    y: jnp.ndarray,          # (B, t, HW, c) residual stream, NATIVE layout
    wq: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray,  # (c, inner)
    wo: jnp.ndarray, bo: jnp.ndarray,                   # (inner, c), (c,)
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,        # (c,)
    *, heads: int, eps: float = 1e-5, group: int = 32,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Same fused block as fused_temporal_self_attention, but consumes the
    UNet's native (b, t, h*w, c) activation directly: the grid walks
    (batch, HW/group) windows via a strided BlockSpec, so the caller never
    materializes the (b,h,w,t,c) transpose of the full stream (the 5-D
    relayout fusions that cost ~24 ms/eval at 320x512 on v5e). Rows inside
    a block are t-major; the block-diagonal mask becomes a stride-`group`
    comb. Requires HW % group == 0 (true at every shipped UNet level that
    routes here: 2560/640 @ group=32)."""
    B, t, HW, c = y.shape
    inner = wq.shape[1]
    dh = inner // heads
    scale = sm_scale if sm_scale is not None else dh ** -0.5
    G = group
    if HW % G:
        raise ValueError(f"HW={HW} not divisible by group={G}")

    const = lambda i, j: (0, 0)
    const1 = lambda i, j: (0,)
    out = pl.pallas_call(
        functools.partial(_kernel, t=t, heads=heads, dh=dh,
                          sm_scale=float(scale), eps=eps, tmajor=True),
        grid=(B, HW // G),
        in_specs=[
            pl.BlockSpec((1, t, G, c), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((c, inner), const),
            pl.BlockSpec((c, inner), const),
            pl.BlockSpec((c, inner), const),
            pl.BlockSpec((inner, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
        ],
        out_specs=pl.BlockSpec((1, t, G, c), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
    )(y, wq, wk, wv, wo, bo[None], ln_scale[None], ln_bias[None])
    return out


# The shipped UNet temporal sites (c == inner, heads = c/64): level channels
# of the 320-base DynamiCrafter UNet (openaimodel3d.py:284 config).
_SELFCHECK_SITES = ((320, 5), (640, 10))
# the fused kernel may be at most this factor noisier than the bf16 XLA
# twin it replaces, both measured against the fp32 reference
_SELFCHECK_RATIO = 2.0
_SELFCHECK_ABS_FLOOR = 1e-2


def fused_selfcheck(t: int = 16, group: int = 32,
                    ratio: float = _SELFCHECK_RATIO, seed: int = 0):
    """Runtime accuracy gate, grounded in the bf16 noise floor: at
    realistic weight scales (LN gamma ~1, Xavier-scale projections,
    residual-stream activations ~O(5)) compute the fp32 reference, the
    bf16 XLA twin, and the fused kernel on each shipped site shape. The
    kernel passes when its error vs fp32 is within `ratio`x the XLA twin's
    own bf16 error (+ a small absolute floor) — i.e. it adds no meaningful
    noise beyond the precision the shipped bf16 path already accepts.
    Returns (ok, worst_ratio). Callers disable the fused path when not ok
    — the 'evidence gate' from round-1 review item 6."""
    from open_pandora_tpu.ops.attention_xla import mha_xla
    from open_pandora_tpu.ops.norms import layer_norm

    def chain(y, wq, wk, wv, wo, bo, g, b, heads, dh, dtype):
        B, t, c = y.shape
        yd = y.astype(dtype)
        xn = layer_norm(yd, g.astype(dtype), b.astype(dtype),
                        eps=1e-5).astype(dtype)
        q = (xn @ wq.astype(dtype)).reshape(B, t, heads, dh)
        k = (xn @ wk.astype(dtype)).reshape(B, t, heads, dh)
        v = (xn @ wv.astype(dtype)).reshape(B, t, heads, dh)
        out = mha_xla(q, k, v).reshape(B, t, -1) @ wo.astype(dtype)
        return yd.astype(jnp.float32) + out.astype(jnp.float32) \
            + bo.astype(jnp.float32)

    worst = 0.0
    for c, heads in _SELFCHECK_SITES:
        dh = c // heads
        ks = jax.random.split(jax.random.PRNGKey(seed), 8)
        B = group
        y = (jax.random.normal(ks[0], (B, t, c)) * 5.0).astype(jnp.bfloat16)
        std = c ** -0.5
        wq, wk, wv = (jax.random.normal(k, (c, c)).astype(jnp.bfloat16) * std
                      for k in ks[1:4])
        wo = jax.random.normal(ks[4], (c, c)).astype(jnp.bfloat16) * std
        bo = jax.random.normal(ks[5], (c,)).astype(jnp.bfloat16) * 0.02
        g = (1.0 + 0.1 * jax.random.normal(ks[6], (c,))).astype(jnp.bfloat16)
        b = (0.02 * jax.random.normal(ks[7], (c,))).astype(jnp.bfloat16)

        fused = fused_temporal_self_attention(y, wq, wk, wv, wo, bo, g, b,
                                              heads=heads, group=group)
        ref32 = chain(y, wq, wk, wv, wo, bo, g, b, heads, dh, jnp.float32)
        twin16 = chain(y, wq, wk, wv, wo, bo, g, b, heads, dh, jnp.bfloat16)
        scale = float(jnp.abs(ref32).mean())
        err_fused = float(jnp.abs(fused.astype(jnp.float32) - ref32).max())
        err_twin = float(jnp.abs(twin16 - ref32).max())
        floor = max(err_twin, _SELFCHECK_ABS_FLOOR * scale)
        worst = max(worst, err_fused / floor)
    return worst <= ratio, worst


_SELFCHECK_DONE = False


def ensure_fused_accuracy() -> None:
    """Eager startup gate for pipeline entrypoints (NOT trace-time): on a
    TPU backend, run fused_selfcheck once; on failure set
    PANDORA_DISABLE_FUSED so models/unet3d.py routes every temporal site
    through the XLA twin. No-op on CPU (kernel needs the TPU compiler)."""
    import logging

    global _SELFCHECK_DONE
    if _SELFCHECK_DONE or flags.flag("PANDORA_DISABLE_FUSED"):
        return
    _SELFCHECK_DONE = True
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError:
        on_tpu = False
    if not on_tpu:
        return
    ok, ratio = fused_selfcheck()
    log = logging.getLogger("open_pandora_tpu.ops")
    if ok:
        log.info("fused temporal kernel selfcheck ok (%.2fx the bf16 twin's "
                 "error vs fp32)", ratio)
    else:
        flags.set_flag("PANDORA_DISABLE_FUSED", True)
        log.warning("fused temporal kernel selfcheck FAILED (%.2fx the bf16 "
                    "twin's error vs fp32, limit %.1fx) — falling back to "
                    "the XLA twin", ratio, _SELFCHECK_RATIO)
