"""Pallas kernel for batched SMALL-sequence self-attention (temporal t=16).

The UNet3D's temporal attention is (b*h*w*heads, t, t) with t=16 — tens of
thousands of 16x16x64 matmuls. XLA runs these as individual small dots at
<1% MXU utilization (measured 3.6 ms for ~1 GFLOP on v5e). This kernel
packs G positions' Q/K/V into one (G*t, D) tile and computes ONE
(G*t, G*t) MXU matmul with a block-diagonal mask, trading G x wasted
cross-position FLOPs for full-rate MXU execution — a net win for G*t up to
~512 (waste factor G vs ~100x utilization gain).

Inference-only fast path (the temporal sites run under no-grad in the DDIM
loop); training falls back to the XLA twin via ops.attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, t: int, heads: int, dh: int,
            sm_scale: float, causal: bool):
    q = q_ref[0]  # (G*t, H*D) — heads packed on lanes; no host transpose
    k = k_ref[0]
    v = v_ref[0]
    n = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    mask = (row // t) == (col // t)  # block-diagonal: own position only
    if causal:
        mask = jnp.logical_and(mask, (col % t) <= (row % t))
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
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def small_self_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    *, heads: int, sm_scale: Optional[float] = None, causal: bool = False,
    group: int = 32,
) -> jnp.ndarray:
    """q/k/v: (B, t, H*D) with small t (<=32), heads packed in the feature
    dim (the layout the transformer block produces — the group packing
    (B, t, HD) -> (B/G, G*t, HD) is a pure reshape, zero relayout cost).
    Returns (B, t, H*D)."""
    B, t, HD = q.shape
    dh = HD // heads
    scale = sm_scale if sm_scale is not None else dh ** -0.5

    G = group
    n_pad = (-B) % G
    if n_pad:
        pad = ((0, n_pad), (0, 0), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
    n_groups = (B + n_pad) // G
    qg = q.reshape(n_groups, G * t, HD)
    kg = k.reshape(n_groups, G * t, HD)
    vg = v.reshape(n_groups, G * t, HD)

    out = pl.pallas_call(
        functools.partial(_kernel, t=t, heads=heads, dh=dh,
                          sm_scale=float(scale), causal=causal),
        grid=(n_groups,),
        in_specs=[pl.BlockSpec((1, G * t, HD), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, G * t, HD), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
    )(qg, kg, vg)

    out = out.reshape(-1, t, HD)
    if n_pad:
        out = out[:B]
    return out
