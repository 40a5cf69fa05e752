"""Pure-XLA multi-head attention — the parity oracle for the Pallas kernels.

Matches the reference math (DynamiCrafter/lvdm/modules/attention.py:42-144):
softmax over scaled QK^T in fp32, then PV. Used directly on CPU, for tiny
sequence lengths (temporal t=16 attention, cross-attention with 77/16-token
KV), and in tests as the golden implementation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head attention.

    q: (B, N, H, D); k, v: (B, M, H, D). mask: broadcastable to (B, H, N, M),
    True = attend. Returns (B, N, H, D) in q.dtype; softmax in fp32.
    """
    *_, d = q.shape
    scale = sm_scale if sm_scale is not None else d ** -0.5
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if causal:
        n, m = s.shape[-2], s.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        cmask = (col <= row + (m - n))  # allows m>=n (suffix alignment)
        s = jnp.where(cmask, s, NEG_INF)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
