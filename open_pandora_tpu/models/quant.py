"""Weight-only int8 quantization for the frozen LLaMA trunk.

Why: a full WorldModel in bf16 needs ~19 GB (7B LLM 13.5 + diffusion stack
5.5) — over one v5e's 16 GB HBM, and the axon tunnel moves 0.09 GB/s so
weight-swapping between conditioning and diffusion phases is impractical.
Per-output-channel symmetric int8 on the LLM's projection matrices brings
it to ~12.3 GB: the whole composite fits one chip.

The LLM is FROZEN in every Open-Pandora training stage
(model.py:517-553 freeze_sub_models), so quantization error is a pure
inference trade-off, applied after conversion from the released weights.
(The reference's bitsandbytes 4/8-bit option at ChatUniVi/train/train.py:
869-884 is the analogous capability.)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# 2D kernels under these path components get quantized
_QUANT_PARENT_KEYS = ("self_attn", "mlp")
_QUANT_LEAF_MODULES = ("q_proj", "k_proj", "v_proj", "o_proj",
                       "gate_proj", "up_proj", "down_proj", "lm_head")


def quantize_kernel(w) -> Dict[str, Any]:
    """(in, out) float -> {'kernel_q': int8, 'scale': fp32 (out,)}."""
    w = np.asarray(w, dtype=np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"kernel_q": q, "scale": scale.astype(np.float32)}


def dequantize_kernel(q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_llama_params(params: dict) -> dict:
    """Full-precision LlamaForCausalLM params -> int8-quantized tree
    (matching the quantized=True module structure: every projection
    Dense's {kernel} becomes {kernel_q, scale})."""

    def walk(node, name=""):
        if isinstance(node, dict):
            if name in _QUANT_LEAF_MODULES and "kernel" in node:
                return quantize_kernel(node["kernel"])
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)


def tree_nbytes(params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params)
               if hasattr(x, "dtype"))
