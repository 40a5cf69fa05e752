"""LoRA parameter plumbing for the LLaMA trunk.

Behavioral spec: ChatUniVi trains LoRA adapters via peft over every linear
module except lm_head (train.py:98-103,162-173, get_peft_state_maybe_zero_3
:121-146) and merges them at load time (model/builder.py:11,36-47).

Here adapters are flax params named lora_a/lora_b living INSIDE each
projection's scope with the frozen base kernel nested under `base`
(models/llama.py LoRADense). This module converts between the plain and
LoRA param layouts and implements the deployment-time merge."""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp

LORA_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj")


def _walk(tree, fn, path=()):
    if isinstance(tree, Mapping):
        return {k: _walk(v, fn, path + (k,)) for k, v in tree.items()}
    return fn(path, tree)


def add_lora_params(key: jax.Array, llama_params: Dict,
                    lora_template: Dict) -> Dict:
    """Graft plain (non-LoRA) llama params onto a LoRA-layout template
    (from LlamaForCausalLM(cfg with lora_rank>0).init): base kernels come
    from `llama_params`, lora_a/lora_b keep the template's fresh init."""

    def get(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    def fn(path, leaf):
        if "base" in path:
            # .../<proj>/base/kernel -> source .../<proj>/kernel
            i = path.index("base")
            src = path[:i] + path[i + 1:]
            return jnp.asarray(get(llama_params, src))
        if path[-1] in ("lora_a", "lora_b"):
            return leaf  # fresh adapter init
        return jnp.asarray(get(llama_params, path))

    return _walk(lora_template, fn)


def merge_lora_params(lora_params: Dict, alpha: float, rank: int) -> Dict:
    """Deployment merge (builder.py:36-47): W' = W + A@B * α/r, drop the
    adapters, restore the plain layout. int8 bases are dequantized-merged-
    requantized is NOT done here — merge before quantization."""
    scale = alpha / rank

    def merge(tree):
        if not isinstance(tree, Mapping):
            return tree
        if "base" in tree and "lora_a" in tree:
            base = dict(tree["base"])
            if "kernel_q" in base:
                raise ValueError("merge LoRA before int8 quantization")
            a, b = tree["lora_a"], tree["lora_b"]
            base["kernel"] = (jnp.asarray(base["kernel"])
                              + (a @ b) * scale).astype(base["kernel"].dtype)
            return base
        return {k: merge(v) for k, v in tree.items()}

    return merge(lora_params)
