"""Sequence-parallel ring attention over a device mesh.

The reference has NO sequence/context parallelism (SURVEY §2.7: its answer
to long sequences is algorithmic — clustering, factorized attention,
per-frame VAE). This module adds the real thing as a new TPU-native
capability: the attention sequence axis is sharded over a mesh axis, each
device computes flash attention against its local KV shard, and KV shards
rotate around the ring with `jax.lax.ppermute` (ICI neighbor exchange)
while partial outputs merge with online-softmax (log-sum-exp) algebra.
Memory per device is O(seq/n) and the KV transfer overlaps compute — the
standard blockwise-ring recipe, expressed with shard_map + collectives
rather than hand-written RDMA.

Use case: 576x1024 spatial self-attention (9216 tokens x 16 frames) sharded
4-8 ways, or any future resolution where a single chip's attention memory
or FLOPs bound the step. Non-causal only (UNet spatial attention is
bidirectional)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # moved out of experimental in newer jax
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _attn_with_lse(q, k, v, sm_scale: Optional[float] = None):
    """(B, N, H, D) x (B, M, H, D) -> (out (B,N,H,D), lse (B,N,H)).
    fp32 softmax statistics (matches ops.attention_xla)."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else d ** -0.5
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhnm,bmhd->bnhd", (p / l).astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    lse = (m + jnp.log(l))[..., 0]              # (B, H, N)
    return o, jnp.transpose(lse, (0, 2, 1))     # lse -> (B, N, H)


def _merge(o_a, l_a, o_b, l_b):
    """Online-softmax merge of two attention partials."""
    l_new = jnp.logaddexp(l_a, l_b)
    w_a = jnp.exp(l_a - l_new)[..., None].astype(o_a.dtype)
    w_b = jnp.exp(l_b - l_new)[..., None].astype(o_b.dtype)
    return o_a * w_a + o_b * w_b, l_new


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh,
    axis: str = "data",
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Self-attention with the SEQUENCE axis sharded over `axis` of `mesh`.

    q/k/v: (B, N, H, D) global arrays (N divisible by the axis size).
    Returns the exact (up to fp reassociation) full-attention result with
    per-device memory O(N/n) — each ring step attends the local q shard to
    a rotating KV shard and merges via log-sum-exp."""
    n_dev = mesh.shape[axis]
    assert q.shape[1] % n_dev == 0, (
        f"sequence {q.shape[1]} not divisible by mesh axis {axis}={n_dev}")
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def local_fn(q_l, k_l, v_l):
        o, lse = _attn_with_lse(q_l, k_l, v_l, sm_scale)

        def body(_, carry):
            k_c, v_c, o_a, l_a = carry
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            o_i, l_i = _attn_with_lse(q_l, k_c, v_c, sm_scale)
            o_m, l_m = _merge(o_a, l_a, o_i, l_i)
            return k_c, v_c, o_m, l_m

        _, _, o, lse = jax.lax.fori_loop(0, n_dev - 1, body,
                                         (k_l, v_l, o, lse))
        return o

    spec = P(None, axis, None, None)
    return shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)
