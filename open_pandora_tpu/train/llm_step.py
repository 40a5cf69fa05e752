"""ChatUniVi LLM supervised finetuning — the reference's separate
pretraining pipeline (ChatUniVi/train/train.py:850-1082: HF Trainer +
DeepSpeed over conversation data with multimodal splice; labels at image
positions set to IGNORE_INDEX=-100, ChatUniVi/constants.py + arch.py
label handling).

Not used by the Open-Pandora product training (the LLM is frozen there) —
this provides the capability to (re)train the ChatUniVi base: next-token
cross-entropy over spliced multimodal sequences, trainable = LLaMA +
mm_projector (vision tower and cluster stages are parameter-free/frozen,
matching train.py's freeze policy with tune_mm_mlp_adapter).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from open_pandora_tpu.core.config import TrainConfig
from open_pandora_tpu.models.world_model import (MultimodalPrompt,
                                                 PrefixSegment, TokenSegment,
                                                 WorldModel)
from open_pandora_tpu.models.llama import LlamaForCausalLM
from open_pandora_tpu.parallel.mesh import MeshSpec
from open_pandora_tpu.train.optim import TRAINABLE_KEYS
from open_pandora_tpu.train.step import make_finetune_step

IGNORE_INDEX = -100

# register the SFT freeze policy
TRAINABLE_KEYS.setdefault("llm_sft", ("llama", "mm_projector"))


def build_labels(wm: WorldModel, prompt: MultimodalPrompt,
                 supervise_from: int = 0) -> jnp.ndarray:
    """Labels aligned with build_inputs_embeds output: token positions carry
    their ids, image/video/prefix feature spans carry IGNORE_INDEX
    (arch.py:302-306 label splice). `supervise_from` masks the first N
    token segments (instruction text) like the conversation preprocessing
    (train.py:298-643) masks the human turns."""
    cfg = wm.cfg
    cols: List[jnp.ndarray] = []
    tok_seg_idx = 0
    b = prompt.images.shape[0] if prompt.images is not None else 1
    for seg in prompt.segments:
        if isinstance(seg, TokenSegment):
            ids = jnp.asarray(seg.ids)
            if tok_seg_idx < supervise_from:
                cols.append(jnp.full_like(ids, IGNORE_INDEX))
            else:
                cols.append(ids)
            tok_seg_idx += 1
        else:
            if isinstance(seg, PrefixSegment):
                n = seg.length
            else:
                n = _feature_len(cfg, seg)
            cols.append(jnp.full((b, n), IGNORE_INDEX, jnp.int32))
    return jnp.concatenate(cols, axis=1)


def _feature_len(cfg, seg) -> int:
    from open_pandora_tpu.models.world_model import ImageSegment, VideoSegment
    import math

    per_image = sum(cfg.cluster.spatial_rates)
    if isinstance(seg, ImageSegment):
        return per_image
    if isinstance(seg, VideoSegment):
        events = max(math.ceil(len(seg.indices) * cfg.cluster.temporal_rate), 1)
        return per_image * events
    raise TypeError(seg)


def sft_loss(wm: WorldModel, trainable, frozen, batch, key):
    """batch: {'prompt': MultimodalPrompt, 'labels': (b, L) int32}."""
    from open_pandora_tpu.train.optim import deep_merge
    params = deep_merge(trainable, frozen)
    prompt: MultimodalPrompt = batch["prompt"]
    labels = batch["labels"]
    embeds, _ = wm.build_inputs_embeds(params, prompt)
    # mid-sequence pads are possible (chunk columns pad to the batch max, so
    # multi-turn / image-after-turn-1 batches mix lengths): mask pads out of
    # attention and keep real tokens' RoPE positions pad-transparent,
    # mirroring get_diffusion_conditioning
    attention_mask = wm.attention_mask_for(prompt)
    positions = None
    if attention_mask is not None:
        positions = jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1
    hidden = wm.llama.apply(params["llama"], embeds,
                            positions=positions,
                            attention_mask=attention_mask,
                            method=LlamaForCausalLM.trunk)
    logits = wm.llama.apply(params["llama"], hidden,
                            method=lambda m, h: m.lm_head(h))
    # next-token: predict labels[t+1] from position t
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe_targets = jnp.where(mask, targets, 0)
    ll = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), safe_targets)
    denom = jnp.maximum(jnp.sum(mask), 1)
    loss = jnp.sum(ll * mask) / denom
    return loss, {"loss": loss, "n_supervised": denom}


def make_llm_sft_step(wm: WorldModel, tcfg: TrainConfig,
                      mesh_spec: Optional[MeshSpec] = None,
                      fsdp: bool = False):
    """Full SFT (llama + mm_projector) by default; when the config enables
    LoRA (llama.lora_rank > 0) only the adapters + mm_projector train
    (ChatUniVi train.py:98-103 lora_enable path).

    fsdp=True shards the LLaMA params over the data axis (the reference's
    FSDP-wrapped trainer, ChatUniVi/train/train.py:974) — full-SFT at 7B
    scale does not fit replicated."""
    import functools

    stage = "llm_sft_lora" if wm.cfg.llama.lora_rank > 0 else "llm_sft"
    return make_finetune_step(wm.diffusion, tcfg, mesh_spec=mesh_spec,
                              stage=stage, fsdp=fsdp,
                              loss_fn=functools.partial(sft_loss, wm))
