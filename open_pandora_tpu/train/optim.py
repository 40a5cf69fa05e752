"""Optimizer + freeze policy.

Behavioral spec: /root/reference/model.py:951-972 configure_optimizers —
AdamW over [UNet params] + [connector params: query_tokens, image_prefix,
diffusion_proj, qformer, qformer_proj]; alignment stage adds
CosineAnnealingLR (lr -> 1e-6 over max_steps); finetune uses constant lr.
Grad clip 0.5 by norm (config/config.yaml:32-33). Frozen sub-models
(LLM, CLIP towers, VAE, text encoders) via freeze_sub_models
(model.py:517-553) — here: the frozen partition simply isn't passed to the
optimizer, and gradients are never computed for it.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import optax

from open_pandora_tpu.core.config import TrainConfig

# params pytree top-level keys that are trainable per stage
TRAINABLE_KEYS = {
    "finetune": ("unet", "connector"),
    "alignment": ("connector",),
    # DynamiCrafter-only finetune (no LLM in the loop)
    "dynamicrafter": ("unet",),
}


def split_tree(tree, pred, path=()):
    """Split a nested-dict pytree by a path predicate -> (selected, rest);
    empty branches are dropped (None at the top means 'nothing')."""
    if isinstance(tree, Mapping):
        sel, rest = {}, {}
        for k, v in tree.items():
            s, r = split_tree(v, pred, path + (k,))
            if s is not None:
                sel[k] = s
            if r is not None:
                rest[k] = r
        return (sel if sel else None), (rest if rest else None)
    return (tree, None) if pred(path) else (None, tree)


def deep_merge(a, b):
    """Recursive union of two nested dicts (disjoint leaves; `a` wins on
    impossible conflicts). Top-level-disjoint trees behave exactly like
    {**a, **b}."""
    if isinstance(a, Mapping) and isinstance(b, Mapping):
        out = dict(a)
        for k, v in b.items():
            out[k] = deep_merge(out[k], v) if k in out else v
        return out
    return a


def _lora_pred(path) -> bool:
    """LoRA SFT freeze policy: adapters (+ mm_projector) train, everything
    else is frozen (ChatUniVi train.py:121-146 peft state split)."""
    return (path[0] == "mm_projector"
            or any(str(k) in ("lora_a", "lora_b") for k in path))


def trainable_partition(params: dict, stage: str) -> Tuple[dict, dict]:
    """Split the composite params dict into (trainable, frozen) by stage.
    Stages listed in TRAINABLE_KEYS split at the top level; 'llm_sft_lora'
    splits by leaf path (adapters live inside the llama subtree)."""
    if stage == "llm_sft_lora":
        sel, rest = split_tree(params, _lora_pred)
        return sel or {}, rest or {}
    keys = TRAINABLE_KEYS[stage]
    trainable = {k: v for k, v in params.items() if k in keys}
    frozen = {k: v for k, v in params.items() if k not in keys}
    return trainable, frozen


def lr_schedule(cfg: TrainConfig):
    if cfg.lr_schedule == "cosine":
        # CosineAnnealingLR(T_max=max_steps, eta_min=min_lr) (model.py:967-972)
        return optax.cosine_decay_schedule(
            init_value=cfg.learning_rate, decay_steps=cfg.max_steps,
            alpha=cfg.min_lr / cfg.learning_rate)
    return cfg.learning_rate


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adamw8bit":
        from open_pandora_tpu.train.optim8bit import adamw8bit
        inner = adamw8bit(
            learning_rate=lr_schedule(cfg),
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adamw":
        inner = optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}; "
                         "choose adamw or adamw8bit")
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), inner)
