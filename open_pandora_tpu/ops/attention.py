"""Attention dispatcher: Pallas flash on TPU for large sequences, XLA twin
everywhere else.

Heuristics:
  - cross-attention with tiny KV (77 text / 16*t image tokens,
    reference attention.py:89-144) and temporal attention (t=16,
    attention.py:365-412) never materialize a big score matrix -> XLA is
    already at the bandwidth roofline there; flash adds nothing.
  - spatial self-attention (h*w = 2560..9216 tokens) and LLaMA causal
    prefill get the Pallas flash kernel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from open_pandora_tpu.ops.attention_xla import mha_xla
from open_pandora_tpu.ops.flash_attention import flash_attention
from open_pandora_tpu.ops.small_attention import (small_attention,
                                                  small_attention_eligible)

# below this q*kv size, the scores matrix is small enough that XLA's fused
# softmax-attention is as fast as a custom kernel
_FLASH_MIN_Q = 512
_FLASH_MIN_KV = 256


def _on_tpu() -> bool:
    # the axon platform registers TPU devices even when a CPU default device
    # is pinned (tests) — honor the default-device override first
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform == "tpu"
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention, q (B, N, H, D), k/v (B, M, H, D) -> (B, N, H, D).

    backend: 'auto' | 'flash' | 'small' | 'xla'. Arbitrary masks force the
    XLA path (the Pallas kernels support causal + kv-length masking only).

    Under an active `parallel.sp.sequence_parallel(mesh, axis)` context,
    eligible causal self-attention (LLaMA prefill) is ring-sharded over
    the mesh axis instead (sequence-parallel long-context path).
    """
    from open_pandora_tpu.parallel.sp import (current_sp, ring_attention,
                                              sp_eligible)
    if sp_eligible(q.shape, k.shape, causal, mask):
        mesh, axis = current_sp()
        return ring_attention(q, k, v, mesh=mesh, axis=axis,
                              sm_scale=sm_scale, causal=True)
    if backend == "auto":
        if (_on_tpu() and mask is None
                and q.shape[1] >= _FLASH_MIN_Q
                and k.shape[1] >= _FLASH_MIN_KV):
            backend = "flash"
        elif (_on_tpu() and mask is None and not causal
              and small_attention_eligible(
                  q.shape[1], k.shape[1], q.shape[0] * q.shape[2])):
            # tiny-N huge-batch sites (temporal t=16 attention): the XLA
            # lowering materializes (B, H, N, M) fp32 scores in HBM with 8x
            # layout padding — the hi-res train step's biggest allocation
            # class; the batch-tiled kernel keeps scores in VMEM
            backend = "small"
        else:
            backend = "xla"
    if backend == "small":
        if mask is not None or causal:
            raise ValueError("small backend supports unmasked attention only")
        return small_attention(q, k, v, sm_scale=sm_scale)
    if backend == "flash":
        if mask is not None:
            raise ValueError("flash backend supports causal masking only")
        return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale)
    return mha_xla(q, k, v, causal=causal, mask=mask, sm_scale=sm_scale)
