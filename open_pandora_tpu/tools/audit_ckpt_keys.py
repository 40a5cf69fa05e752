"""Converter key-coverage audit against the released checkpoint surface.

Synthesizes the full key/shape surface of the released Open-Pandora
WorldModel state dict — module tree per /root/reference/model.py:69-113
(video_model / diffusion_qformer(+proj,+query_tokens) / diffusion_proj /
image_prefix / diffusion_model) — by instantiating the ACTUAL torch module
classes on the meta device wherever they are importable here:

  - transformers LlamaForCausalLM / CLIPVisionModel / Blip2QFormerModel at
    the shipped config_json.json dimensions
  - reference lvdm UNetModel / AutoencoderKL / Resampler at the shipped
    inference_512_v1.0.yaml sizes
  - exact open_clip text/visual tower layouts (nn.MultiheadAttention-based
    resblocks, the layout condition.py:179-382 consumes), including the
    params the frozen embedders never use (text_projection, logit_scale,
    visual.proj, visual.ln_post)
  - ddpm3d schedule buffers (ddpm3d.py:141-181,503-510)

then runs core.convert.convert_world_model over a key-tracking lazy-zeros
dict and verifies:

  1. every synthetic key is either consumed by the converter or in the
     known-dead allowlist (schedule buffers / unused open_clip params);
  2. the converted pytree is exactly congruent (structure + shapes) with
     WorldModel.init_params via jax.eval_shape.

This makes conversion of the real released weights turnkey: the day the
checkpoint asset is available, only tensor VALUES change.

Run: PYTHONPATH=/root/repo python -m open_pandora_tpu.tools.audit_ckpt_keys
(~10 GB transient RAM: lazy fp32 zeros materialize as the converter reads.)
"""

from __future__ import annotations

import fnmatch
import sys
from typing import Dict, List, Tuple

import numpy as np

# keys present in the released state dict that the converter intentionally
# does not consume (dead weight for inference; schedules are recomputed
# from config — diffusion/schedule.py)
ALLOWED_UNUSED = [
    # ddpm3d registered buffers (ddpm3d.py:141-181, 503-510)
    "diffusion_model.betas",
    "diffusion_model.alphas_cumprod*",
    "diffusion_model.sqrt_*",
    "diffusion_model.log_one_minus_alphas_cumprod",
    "diffusion_model.posterior_*",
    "diffusion_model.scale_arr",
    "diffusion_model.logvar",
    "diffusion_model.scale_factor",
    # open_clip params unused by the frozen embedders' forward
    # (condition.py:179-236 text: penultimate hidden state, no projection;
    # :300-382 visual V2: all tokens, no ln_post/proj)
    "diffusion_model.cond_stage_model.model.text_projection",
    "diffusion_model.cond_stage_model.model.logit_scale",
    "diffusion_model.cond_stage_model.model.transformer.resblocks.23.*",
    "diffusion_model.embedder.model.visual.proj",
    "diffusion_model.embedder.model.visual.ln_post.*",
    # HF vision tower: CLS-pooled head + final LN unused by the -2-layer
    # feature select (ChatUniVi clip_encoder.py hidden_states[-2])
    "video_model.model.vision_tower.vision_tower.vision_model.post_layernorm.*",
    "video_model.model.vision_tower.vision_tower.vision_model.encoder.layers.23.*",
    # Blip2QFormer text-branch FFN (query tokens only use *_query, HF
    # modeling_blip_2.py Blip2QFormerLayer.feed_forward_chunk_query)
    "diffusion_qformer.encoder.layer.*.intermediate.dense.*",
    "diffusion_qformer.encoder.layer.*.output.dense.*",
    "diffusion_qformer.encoder.layer.*.output.LayerNorm.*",
]


class TrackingFlat(dict):
    """Maps key -> shape; materializes fp32 zeros on read and records which
    keys the converter consumed."""

    def __init__(self, shapes: Dict[str, Tuple[int, ...]]):
        super().__init__(shapes)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        shape = super().__getitem__(k)
        return np.zeros(shape, np.float32)


def _meta_state_shapes(mod) -> Dict[str, Tuple[int, ...]]:
    return {k: tuple(v.shape) for k, v in mod.state_dict().items()}


def _prefixed(shapes: Dict, prefix: str) -> Dict:
    return {f"{prefix}{k}": v for k, v in shapes.items()}


def build_surface() -> Dict[str, Tuple[int, ...]]:
    import torch
    import torch.nn as nn

    shapes: Dict[str, Tuple[int, ...]] = {}

    with torch.device("meta"):
        # -- video_model: ChatUniViLlamaForCausalLM = HF llama + ViT-L
        #    tower + mm_projector (ChatUniVi/model/arch.py:16)
        from transformers import (CLIPVisionConfig, CLIPVisionModel,
                                  LlamaConfig, LlamaForCausalLM)
        llama = LlamaForCausalLM(LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32))
        shapes.update(_prefixed(_meta_state_shapes(llama), "video_model."))
        vit = CLIPVisionModel(CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=224, patch_size=14))
        shapes.update(_prefixed(
            _meta_state_shapes(vit),
            "video_model.model.vision_tower.vision_tower."))
        shapes.update(_prefixed(
            _meta_state_shapes(nn.Linear(1024, 4096)),
            "video_model.model.mm_projector."))

        # -- connector head (model.py:77-92)
        from transformers import Blip2QFormerConfig, Blip2QFormerModel
        qf = Blip2QFormerModel(Blip2QFormerConfig(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, cross_attention_frequency=2,
            encoder_hidden_size=1408))
        shapes.update(_prefixed(_meta_state_shapes(qf), "diffusion_qformer."))
        shapes.update(_prefixed(_meta_state_shapes(nn.Linear(4096, 768)),
                                "diffusion_qformer_proj."))
        shapes.update(_prefixed(_meta_state_shapes(nn.Linear(768, 1024)),
                                "diffusion_proj."))
        shapes["diffusion_query_tokens"] = (77, 768)
        shapes["image_prefix.weight"] = (64, 4096)  # Linear(4096->64, no bias)

        # -- open_clip towers, exact nn.MultiheadAttention-based layout
        def resblock(width):
            class B(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.ln_1 = nn.LayerNorm(width)
                    self.attn = nn.MultiheadAttention(width, 8)
                    self.ln_2 = nn.LayerNorm(width)
                    import collections
                    self.mlp = nn.Sequential(collections.OrderedDict([
                        ("c_fc", nn.Linear(width, width * 4)),
                        ("gelu", nn.GELU()),
                        ("c_proj", nn.Linear(width * 4, width))]))
            return B()

        # text: ViT-H text tower (width 1024, 24 layers, vocab 49408)
        tw = 1024
        shapes["diffusion_model.cond_stage_model.model.token_embedding.weight"] = (49408, tw)
        shapes["diffusion_model.cond_stage_model.model.positional_embedding"] = (77, tw)
        shapes["diffusion_model.cond_stage_model.model.text_projection"] = (tw, 1024)
        shapes["diffusion_model.cond_stage_model.model.logit_scale"] = ()
        for i in range(24):
            shapes.update(_prefixed(
                _meta_state_shapes(resblock(tw)),
                f"diffusion_model.cond_stage_model.model.transformer.resblocks.{i}."))
        shapes.update(_prefixed(
            _meta_state_shapes(nn.LayerNorm(tw)),
            "diffusion_model.cond_stage_model.model.ln_final."))

        # visual: ViT-H/14 (width 1280, 32 layers, patch 14)
        vw = 1280
        vp = "diffusion_model.embedder.model.visual."
        shapes[vp + "conv1.weight"] = (vw, 3, 14, 14)
        shapes[vp + "class_embedding"] = (vw,)
        shapes[vp + "positional_embedding"] = (257, vw)
        shapes[vp + "proj"] = (vw, 1024)
        shapes.update(_prefixed(_meta_state_shapes(nn.LayerNorm(vw)),
                                vp + "ln_pre."))
        shapes.update(_prefixed(_meta_state_shapes(nn.LayerNorm(vw)),
                                vp + "ln_post."))
        for i in range(32):
            shapes.update(_prefixed(_meta_state_shapes(resblock(vw)),
                                    vp + f"transformer.resblocks.{i}."))

    # -- lvdm modules at the shipped inference_512_v1.0.yaml sizes (real
    #    reference classes; meta device keeps instantiation instant)
    ref = "/root/reference/DynamiCrafter"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from lvdm.models.autoencoder import AutoencoderKL
    from lvdm.modules.encoders.resampler import Resampler
    from lvdm.modules.networks.openaimodel3d import UNetModel

    with torch.device("meta"):
        unet = UNetModel(
            in_channels=8, out_channels=4, model_channels=320,
            attention_resolutions=[4, 2, 1], num_res_blocks=2,
            channel_mult=[1, 2, 4, 4], dropout=0.1, num_head_channels=64,
            transformer_depth=1, context_dim=1024, use_linear=True,
            use_checkpoint=True, temporal_conv=True, temporal_attention=True,
            temporal_selfatt_only=True, use_relative_position=False,
            use_causal_attention=False, temporal_length=16,
            addition_attention=True, image_cross_attention=True,
            default_fs=24, fs_condition=True)
        shapes.update(_prefixed(_meta_state_shapes(unet),
                                "diffusion_model.model.diffusion_model."))
        vae = AutoencoderKL(
            ddconfig=dict(double_z=True, z_channels=4, resolution=256,
                          in_channels=3, out_ch=3, ch=128,
                          ch_mult=[1, 2, 4, 4], num_res_blocks=2,
                          attn_resolutions=[], dropout=0.0),
            lossconfig={"target": "torch.nn.Identity"}, embed_dim=4)
        shapes.update(_prefixed(_meta_state_shapes(vae),
                                "diffusion_model.first_stage_model."))
        res = Resampler(dim=1024, depth=4, dim_head=64, heads=12,
                        num_queries=16, embedding_dim=1280, output_dim=1024,
                        ff_mult=4, video_length=16)
        shapes.update(_prefixed(_meta_state_shapes(res),
                                "diffusion_model.image_proj_model."))

    # ddpm3d schedule buffers (ddpm3d.py:141-181, 503-510)
    for name in ("betas", "alphas_cumprod", "alphas_cumprod_prev",
                 "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                 "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
                 "sqrt_recipm1_alphas_cumprod", "posterior_variance",
                 "posterior_log_variance_clipped", "posterior_mean_coef1",
                 "posterior_mean_coef2", "scale_arr", "logvar"):
        shapes[f"diffusion_model.{name}"] = (1000,)
    return shapes


def tree_shapes(tree, prefix="") -> Dict[str, Tuple[int, ...]]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(tree_shapes(v, f"{prefix}/{k}"))
    else:
        out[prefix] = tuple(tree.shape)
    return out


def main() -> int:
    surface = build_surface()
    print(f"[audit] synthetic released-checkpoint surface: "
          f"{len(surface)} keys")

    flat = TrackingFlat(surface)
    from open_pandora_tpu.core import convert as C
    from open_pandora_tpu.core.config import PandoraConfig
    cfg = PandoraConfig()
    # the synthetic surface is already dialect-normalized (module-derived
    # names, no PL/DeepSpeed wrappers); bypass normalize_state_dict's dict
    # copy so the tracking wrapper sees every converter read
    orig_norm = C.normalize_state_dict
    C.normalize_state_dict = lambda raw: raw
    try:
        params = C.convert_world_model(flat, cfg)
    finally:
        C.normalize_state_dict = orig_norm

    unconsumed = sorted(set(surface) - flat.consumed)
    unexpected = [k for k in unconsumed
                  if not any(fnmatch.fnmatch(k, pat)
                             for pat in ALLOWED_UNUSED)]
    print(f"[audit] consumed {len(flat.consumed)}/{len(surface)} keys; "
          f"{len(unconsumed)} known-dead")
    if unexpected:
        print("[audit] UNEXPECTED unconsumed keys:")
        for k in unexpected[:50]:
            print("   ", k, surface[k])

    # tree congruence vs init_params (shapes only, no memory)
    import jax
    import jax.numpy as jnp

    from open_pandora_tpu.models.world_model import WorldModel
    wm = WorldModel(cfg)
    init_shapes = tree_shapes(jax.eval_shape(
        lambda: wm.init_params(jax.random.PRNGKey(0), height=320, width=512)))
    conv_shapes = tree_shapes(jax.tree_util.tree_map(jnp.shape, params)
                              if False else params)
    missing = sorted(set(init_shapes) - set(conv_shapes))
    extra = sorted(set(conv_shapes) - set(init_shapes))
    mismatched = sorted(k for k in set(init_shapes) & set(conv_shapes)
                        if init_shapes[k] != conv_shapes[k])
    print(f"[audit] target tree: {len(init_shapes)} leaves; converted: "
          f"{len(conv_shapes)}; missing {len(missing)}, extra {len(extra)}, "
          f"shape-mismatched {len(mismatched)}")
    for name, lst in (("missing", missing), ("extra", extra),
                      ("mismatch", mismatched)):
        for k in lst[:25]:
            detail = ""
            if name == "mismatch":
                detail = f" init={init_shapes[k]} conv={conv_shapes[k]}"
            print(f"    {name}: {k}{detail}")

    ok = not unexpected and not missing and not extra and not mismatched
    print("[audit]", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
