"""Torch -> JAX weight conversion for the released Open-Pandora checkpoints.

Covers the three checkpoint dialects the reference reads (SURVEY.md §5.4):
  - HF sharded bin/safetensors (WorldModel.from_pretrained, model.py:487)
  - PL .ckpt {'state_dict': ...} with optional '_forward_module.' prefixes
    and the framestride_embed -> fps_embedding rename (inference.py:39-44,
    utils_train.py:141-146, tools/ckpt2bin.py:9-18)
  - DeepSpeed {'module': ...} with the 16-char prefix strip
    (utils_train.py:148-152, tools/pt2bin.py:5-16)

and the five torch module families:
  llama (HF LLaMA), clip_tower (HF CLIPVisionModel), qformer (HF Blip2),
  open_clip text/visual towers, lvdm UNet3D + VAE + Resampler.

Transforms: Linear (out,in)->(in,out) kernel transpose; Conv2d OIHW->HWIO;
Conv3d OIDHW->DHWIO; norm weight->scale; attention packed in_proj split is
NOT needed (open_clip keeps it packed; our module uses one packed Dense).

Everything takes a flat {torch_key: np.ndarray} dict — loading the actual
.bin/.safetensors files happens in checkpoint.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

Flat = Dict[str, np.ndarray]


# -- generic leaf transforms ------------------------------------------------


def linear(flat: Flat, prefix: str, bias: bool = True) -> dict:
    w = flat[f"{prefix}.weight"]
    if w.ndim == 3:
        # Conv1d with kernel_size=1 acting as a per-position linear —
        # TemporalTransformer proj_in/out with use_linear=False, e.g. the
        # UNet's init_attn (attention.py:332-361, openaimodel3d.py:394).
        # torch layout (out, in, 1) -> flax Dense kernel (in, out).
        w = w[:, :, 0]
    out = {"kernel": np.ascontiguousarray(w.T)}
    if bias and f"{prefix}.bias" in flat:
        out["bias"] = flat[f"{prefix}.bias"]
    return out


def conv2d(flat: Flat, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(
        flat[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
    if bias and f"{prefix}.bias" in flat:
        out["bias"] = flat[f"{prefix}.bias"]
    return out


def conv3d(flat: Flat, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(
        flat[f"{prefix}.weight"].transpose(2, 3, 4, 1, 0))}
    if bias and f"{prefix}.bias" in flat:
        out["bias"] = flat[f"{prefix}.bias"]
    return out


def norm(flat: Flat, prefix: str) -> dict:
    return {"scale": flat[f"{prefix}.weight"], "bias": flat[f"{prefix}.bias"]}


def rmsnorm(flat: Flat, prefix: str) -> dict:
    return {"scale": flat[f"{prefix}.weight"]}


# -- LLaMA (HF) -------------------------------------------------------------


def convert_llama(flat: Flat, num_layers: int, prefix: str = "model") -> dict:
    """HF LlamaForCausalLM -> models.llama.LlamaForCausalLM params."""
    p = prefix
    layers = {}
    for i in range(num_layers):
        lp = f"{p}.layers.{i}"
        layers[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": linear(flat, f"{lp}.self_attn.q_proj", bias=False),
                "k_proj": linear(flat, f"{lp}.self_attn.k_proj", bias=False),
                "v_proj": linear(flat, f"{lp}.self_attn.v_proj", bias=False),
                "o_proj": linear(flat, f"{lp}.self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate_proj": linear(flat, f"{lp}.mlp.gate_proj", bias=False),
                "up_proj": linear(flat, f"{lp}.mlp.up_proj", bias=False),
                "down_proj": linear(flat, f"{lp}.mlp.down_proj", bias=False),
            },
            "input_layernorm": rmsnorm(flat, f"{lp}.input_layernorm"),
            "post_attention_layernorm": rmsnorm(
                flat, f"{lp}.post_attention_layernorm"),
        }
    out = {
        "embed_tokens": {"embedding": flat[f"{p}.embed_tokens.weight"]},
        "model": {**layers, "norm": rmsnorm(flat, f"{p}.norm")},
    }
    lm_head_key = prefix.rsplit(".", 1)[0] if "." in prefix else ""
    lk = (lm_head_key + "." if lm_head_key else "") + "lm_head"
    if f"{lk}.weight" in flat:
        out["lm_head"] = linear(flat, lk, bias=False)
    return {"params": out}


# -- CLIP ViT-L tower (HF CLIPVisionModel) ---------------------------------


def convert_clip_tower(flat: Flat, num_layers_run: int,
                       prefix: str = "vision_model") -> dict:
    p = prefix
    out = {
        "patch_embedding": conv2d(flat, f"{p}.embeddings.patch_embedding",
                                  bias=False),
        "class_embedding": flat[f"{p}.embeddings.class_embedding"],
        "position_embedding": flat[f"{p}.embeddings.position_embedding.weight"],
        "pre_layrnorm": norm(flat, f"{p}.pre_layrnorm"),
    }
    for i in range(num_layers_run):
        lp = f"{p}.encoder.layers.{i}"
        out[f"layers_{i}"] = {
            "layer_norm1": norm(flat, f"{lp}.layer_norm1"),
            "layer_norm2": norm(flat, f"{lp}.layer_norm2"),
            "q_proj": linear(flat, f"{lp}.self_attn.q_proj"),
            "k_proj": linear(flat, f"{lp}.self_attn.k_proj"),
            "v_proj": linear(flat, f"{lp}.self_attn.v_proj"),
            "out_proj": linear(flat, f"{lp}.self_attn.out_proj"),
            "fc1": linear(flat, f"{lp}.mlp.fc1"),
            "fc2": linear(flat, f"{lp}.mlp.fc2"),
        }
    return {"params": out}


# -- open_clip text / visual ------------------------------------------------


def _resblock(flat: Flat, lp: str) -> dict:
    return {
        "ln_1": norm(flat, f"{lp}.ln_1"),
        "ln_2": norm(flat, f"{lp}.ln_2"),
        "attn_in_proj": {
            "kernel": np.ascontiguousarray(flat[f"{lp}.attn.in_proj_weight"].T),
            "bias": flat[f"{lp}.attn.in_proj_bias"],
        },
        "attn_out_proj": linear(flat, f"{lp}.attn.out_proj"),
        "mlp_c_fc": linear(flat, f"{lp}.mlp.c_fc"),
        "mlp_c_proj": linear(flat, f"{lp}.mlp.c_proj"),
    }


def convert_openclip_text(flat: Flat, layers_run: int,
                          prefix: str = "model") -> dict:
    """open_clip text tower (condition.py:179-236) -> CLIPTextEncoder."""
    p = prefix
    out = {
        "token_embedding": flat[f"{p}.token_embedding.weight"],
        "positional_embedding": flat[f"{p}.positional_embedding"],
        "ln_final": norm(flat, f"{p}.ln_final"),
    }
    for i in range(layers_run):
        out[f"resblocks_{i}"] = _resblock(flat, f"{p}.transformer.resblocks.{i}")
    return {"params": out}


def convert_openclip_visual(flat: Flat, layers: int,
                            prefix: str = "model.visual") -> dict:
    """open_clip ViT visual (condition.py:300-382) -> CLIPVisionEncoder."""
    p = prefix
    out = {
        "conv1": conv2d(flat, f"{p}.conv1", bias=False),
        "class_embedding": flat[f"{p}.class_embedding"],
        "positional_embedding": flat[f"{p}.positional_embedding"],
        "ln_pre": norm(flat, f"{p}.ln_pre"),
    }
    for i in range(layers):
        out[f"resblocks_{i}"] = _resblock(flat, f"{p}.transformer.resblocks.{i}")
    return {"params": out}


# -- Resampler --------------------------------------------------------------


def convert_resampler(flat: Flat, depth: int,
                      prefix: str = "image_proj_model") -> dict:
    p = prefix
    out = {
        "latents": flat[f"{p}.latents"],
        "proj_in": linear(flat, f"{p}.proj_in"),
        "proj_out": linear(flat, f"{p}.proj_out"),
        "norm_out": norm(flat, f"{p}.norm_out"),
    }
    for i in range(depth):
        ap = f"{p}.layers.{i}.0"
        fp = f"{p}.layers.{i}.1"
        out[f"layers_{i}_attn"] = {
            "norm1": norm(flat, f"{ap}.norm1"),
            "norm2": norm(flat, f"{ap}.norm2"),
            "to_q": linear(flat, f"{ap}.to_q", bias=False),
            "to_kv": linear(flat, f"{ap}.to_kv", bias=False),
            "to_out": linear(flat, f"{ap}.to_out", bias=False),
        }
        out[f"layers_{i}_ff_norm"] = norm(flat, f"{fp}.0")
        out[f"layers_{i}_ff_1"] = linear(flat, f"{fp}.1", bias=False)
        out[f"layers_{i}_ff_3"] = linear(flat, f"{fp}.3", bias=False)
    return {"params": out}


# -- Q-Former (HF Blip2QFormerModel) ---------------------------------------


def convert_qformer(flat: Flat, num_layers: int, cross_freq: int = 2,
                    prefix: str = "diffusion_qformer") -> dict:
    p = prefix
    out = {"layernorm": norm(flat, f"{p}.layernorm")}

    def bert_attn(ap: str) -> dict:
        return {
            "query": linear(flat, f"{ap}.attention.query"),
            "key": linear(flat, f"{ap}.attention.key"),
            "value": linear(flat, f"{ap}.attention.value"),
            "output_dense": linear(flat, f"{ap}.output.dense"),
            "output_layernorm": norm(flat, f"{ap}.output.LayerNorm"),
        }

    for i in range(num_layers):
        lp = f"{p}.encoder.layer.{i}"
        layer = {"attention": bert_attn(f"{lp}.attention")}
        if i % cross_freq == 0:
            layer["crossattention"] = bert_attn(f"{lp}.crossattention")
        layer["intermediate_query"] = linear(flat, f"{lp}.intermediate_query.dense")
        layer["output_query"] = linear(flat, f"{lp}.output_query.dense")
        layer["output_query_layernorm"] = norm(flat, f"{lp}.output_query.LayerNorm")
        out[f"layer_{i}"] = layer
    return {"params": out}


# -- UNet3D -----------------------------------------------------------------


def _resblock_unet(flat: Flat, tp: str, temporal: bool) -> dict:
    out = {
        "in_norm": norm(flat, f"{tp}.in_layers.0"),
        "in_conv": conv2d(flat, f"{tp}.in_layers.2"),
        "emb_layers_1": linear(flat, f"{tp}.emb_layers.1"),
        "out_norm": norm(flat, f"{tp}.out_layers.0"),
        "out_conv": conv2d(flat, f"{tp}.out_layers.3"),
    }
    if f"{tp}.skip_connection.weight" in flat:
        out["skip_connection"] = conv2d(flat, f"{tp}.skip_connection")
    if temporal and f"{tp}.temopral_conv.conv1.2.weight" in flat:
        tc = f"{tp}.temopral_conv"  # (sic — reference typo)
        out["temporal_conv"] = {
            "conv1_norm": norm(flat, f"{tc}.conv1.0"),
            "conv1": conv3d(flat, f"{tc}.conv1.2"),
            "conv2_norm": norm(flat, f"{tc}.conv2.0"),
            "conv2": conv3d(flat, f"{tc}.conv2.3"),
            "conv3_norm": norm(flat, f"{tc}.conv3.0"),
            "conv3": conv3d(flat, f"{tc}.conv3.3"),
            "conv4_norm": norm(flat, f"{tc}.conv4.0"),
            "conv4": conv3d(flat, f"{tc}.conv4.3"),
        }
    return out


def _xformer_block(flat: Flat, tp: str, image_ca: bool) -> dict:
    """BasicTransformerBlock under `tp`.transformer_blocks.N."""
    out = {}
    n = 0
    while f"{tp}.transformer_blocks.{n}.norm1.weight" in flat:
        bp = f"{tp}.transformer_blocks.{n}"
        blk = {
            "norm1": norm(flat, f"{bp}.norm1"),
            "norm2": norm(flat, f"{bp}.norm2"),
            "norm3": norm(flat, f"{bp}.norm3"),
            "attn1": {
                "to_q": linear(flat, f"{bp}.attn1.to_q", bias=False),
                "to_k": linear(flat, f"{bp}.attn1.to_k", bias=False),
                "to_v": linear(flat, f"{bp}.attn1.to_v", bias=False),
                "to_out_0": linear(flat, f"{bp}.attn1.to_out.0"),
            },
            "attn2": {
                "to_q": linear(flat, f"{bp}.attn2.to_q", bias=False),
                "to_k": linear(flat, f"{bp}.attn2.to_k", bias=False),
                "to_v": linear(flat, f"{bp}.attn2.to_v", bias=False),
                "to_out_0": linear(flat, f"{bp}.attn2.to_out.0"),
            },
            "ff": {
                "net_0_proj": linear(flat, f"{bp}.ff.net.0.proj"),
                "net_2": linear(flat, f"{bp}.ff.net.2"),
            },
        }
        if image_ca and f"{bp}.attn2.to_k_ip.weight" in flat:
            blk["attn2"]["to_k_ip"] = linear(flat, f"{bp}.attn2.to_k_ip",
                                             bias=False)
            blk["attn2"]["to_v_ip"] = linear(flat, f"{bp}.attn2.to_v_ip",
                                             bias=False)
            if f"{bp}.attn2.alpha" in flat:
                blk["attn2"]["alpha"] = flat[f"{bp}.attn2.alpha"]
        out[f"transformer_blocks_{n}"] = blk
        n += 1
    return out


def _spatial_transformer(flat: Flat, tp: str) -> dict:
    return {
        "norm": norm(flat, f"{tp}.norm"),
        "proj_in": linear(flat, f"{tp}.proj_in"),
        "proj_out": linear(flat, f"{tp}.proj_out"),
        **_xformer_block(flat, tp, image_ca=True),
    }


def _temporal_transformer(flat: Flat, tp: str) -> dict:
    return {
        "norm": norm(flat, f"{tp}.norm"),
        "proj_in": linear(flat, f"{tp}.proj_in"),
        "proj_out": linear(flat, f"{tp}.proj_out"),
        **_xformer_block(flat, tp, image_ca=False),
    }


def convert_unet(flat: Flat, cfg, prefix: str = "model.diffusion_model") -> dict:
    """lvdm UNetModel (openaimodel3d.py:284) -> models.unet3d.UNetModel."""
    p = prefix
    out = {
        "time_embed_0": linear(flat, f"{p}.time_embed.0"),
        "time_embed_2": linear(flat, f"{p}.time_embed.2"),
        "out_norm": norm(flat, f"{p}.out.0"),
        "out_conv": conv2d(flat, f"{p}.out.2"),
        "input_blocks_0_0": conv2d(flat, f"{p}.input_blocks.0.0"),
    }
    if cfg.fs_condition:
        out["fps_embedding_0"] = linear(flat, f"{p}.fps_embedding.0")
        out["fps_embedding_2"] = linear(flat, f"{p}.fps_embedding.2")
    if cfg.addition_attention:
        out["init_attn"] = _temporal_transformer(flat, f"{p}.init_attn.0")

    # input blocks
    block_idx = 1
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            tp = f"{p}.input_blocks.{block_idx}"
            out[f"input_blocks_{block_idx}_0"] = _resblock_unet(
                flat, f"{tp}.0", cfg.temporal_conv)
            if ds in cfg.attention_resolutions:
                out[f"input_blocks_{block_idx}_1"] = _spatial_transformer(
                    flat, f"{tp}.1")
                if cfg.temporal_attention:
                    out[f"input_blocks_{block_idx}_2"] = _temporal_transformer(
                        flat, f"{tp}.2")
            block_idx += 1
        if level != len(cfg.channel_mult) - 1:
            out[f"input_blocks_{block_idx}_0"] = {
                "op": conv2d(flat, f"{p}.input_blocks.{block_idx}.0.op")}
            block_idx += 1
            ds *= 2

    # middle
    out["middle_block_0"] = _resblock_unet(flat, f"{p}.middle_block.0",
                                           cfg.temporal_conv)
    out["middle_block_1"] = _spatial_transformer(flat, f"{p}.middle_block.1")
    pos = 2
    if cfg.temporal_attention:
        out["middle_block_2"] = _temporal_transformer(flat,
                                                      f"{p}.middle_block.2")
        pos = 3
    out["middle_block_3"] = _resblock_unet(flat, f"{p}.middle_block.{pos}",
                                           cfg.temporal_conv)

    # output blocks
    block_idx = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            tp = f"{p}.output_blocks.{block_idx}"
            out[f"output_blocks_{block_idx}_0"] = _resblock_unet(
                flat, f"{tp}.0", cfg.temporal_conv)
            pos = 1
            if ds in cfg.attention_resolutions:
                out[f"output_blocks_{block_idx}_1"] = _spatial_transformer(
                    flat, f"{tp}.1")
                pos = 2
                if cfg.temporal_attention:
                    out[f"output_blocks_{block_idx}_2"] = \
                        _temporal_transformer(flat, f"{tp}.2")
                    pos = 3
            if level and i == cfg.num_res_blocks:
                out[f"output_blocks_{block_idx}_up"] = {
                    "conv": conv2d(flat, f"{tp}.{pos}.conv")}
                ds //= 2
            block_idx += 1
    return {"params": out}


# -- VAE --------------------------------------------------------------------


def _vae_resblock(flat: Flat, tp: str) -> dict:
    out = {
        "norm1": norm(flat, f"{tp}.norm1"),
        "conv1": conv2d(flat, f"{tp}.conv1"),
        "norm2": norm(flat, f"{tp}.norm2"),
        "conv2": conv2d(flat, f"{tp}.conv2"),
    }
    if f"{tp}.nin_shortcut.weight" in flat:
        out["nin_shortcut"] = conv2d(flat, f"{tp}.nin_shortcut")
    return out


def _vae_attn(flat: Flat, tp: str) -> dict:
    return {
        "norm": norm(flat, f"{tp}.norm"),
        "q": conv2d(flat, f"{tp}.q"),
        "k": conv2d(flat, f"{tp}.k"),
        "v": conv2d(flat, f"{tp}.v"),
        "proj_out": conv2d(flat, f"{tp}.proj_out"),
    }


def convert_vae(flat: Flat, cfg, prefix: str = "first_stage_model") -> dict:
    p = prefix
    enc = {
        "conv_in": conv2d(flat, f"{p}.encoder.conv_in"),
        "norm_out": norm(flat, f"{p}.encoder.norm_out"),
        "conv_out": conv2d(flat, f"{p}.encoder.conv_out"),
        "mid_block_1": _vae_resblock(flat, f"{p}.encoder.mid.block_1"),
        "mid_attn_1": _vae_attn(flat, f"{p}.encoder.mid.attn_1"),
        "mid_block_2": _vae_resblock(flat, f"{p}.encoder.mid.block_2"),
    }
    n_levels = len(cfg.channel_mult)
    for i in range(n_levels):
        for j in range(cfg.num_res_blocks):
            enc[f"down_{i}_block_{j}"] = _vae_resblock(
                flat, f"{p}.encoder.down.{i}.block.{j}")
        if i != n_levels - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": conv2d(flat, f"{p}.encoder.down.{i}.downsample.conv")}
    dec = {
        "conv_in": conv2d(flat, f"{p}.decoder.conv_in"),
        "norm_out": norm(flat, f"{p}.decoder.norm_out"),
        "conv_out": conv2d(flat, f"{p}.decoder.conv_out"),
        "mid_block_1": _vae_resblock(flat, f"{p}.decoder.mid.block_1"),
        "mid_attn_1": _vae_attn(flat, f"{p}.decoder.mid.attn_1"),
        "mid_block_2": _vae_resblock(flat, f"{p}.decoder.mid.block_2"),
    }
    for i in range(n_levels):
        for j in range(cfg.num_res_blocks + 1):
            dec[f"up_{i}_block_{j}"] = _vae_resblock(
                flat, f"{p}.decoder.up.{i}.block.{j}")
        if i != 0:
            dec[f"up_{i}_upsample"] = {
                "conv": conv2d(flat, f"{p}.decoder.up.{i}.upsample.conv")}
    return {"params": {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv2d(flat, f"{p}.quant_conv"),
        "post_quant_conv": conv2d(flat, f"{p}.post_quant_conv"),
    }}


# -- connector --------------------------------------------------------------


def convert_connector(flat: Flat, qcfg) -> dict:
    qf = convert_qformer(flat, qcfg.num_layers, qcfg.cross_attention_frequency,
                         prefix="diffusion_qformer")
    return {"params": {
        "image_prefix": flat["image_prefix.weight"],
        "qformer_proj": linear(flat, "diffusion_qformer_proj"),
        "query_tokens": flat["diffusion_query_tokens"].reshape(
            qcfg.num_query_tokens, qcfg.hidden_size),
        "qformer": qf["params"],
        "proj": linear(flat, "diffusion_proj"),
    }}


# -- dialect normalization --------------------------------------------------


def normalize_state_dict(raw: Flat) -> Flat:
    """Strip PL/DeepSpeed wrappers + key renames (utils_train.py:136-158)."""
    if "state_dict" in raw and isinstance(raw["state_dict"], dict):
        raw = raw["state_dict"]
    if "module" in raw and isinstance(raw["module"], dict):
        raw = raw["module"]
    out = {}
    for k, v in raw.items():
        if k.startswith("_forward_module."):
            k = k[len("_forward_module."):]
        if "framestride_embed" in k:  # inference.py:39-44
            k = k.replace("framestride_embed", "fps_embedding")
        out[k] = v
    return out


# -- full composite ---------------------------------------------------------


def convert_world_model(flat: Flat, cfg) -> dict:
    """Flat torch dict of the released WorldModel -> full params pytree for
    models.world_model.WorldModel. Key prefixes per model.py:557-600."""
    flat = normalize_state_dict(flat)
    n_tower = cfg.clip_tower.layers + 1 + cfg.clip_tower.select_layer
    return {
        "llama": convert_llama(flat, cfg.llama.num_layers,
                               prefix="video_model.model"),
        "clip_tower": convert_clip_tower(
            flat, n_tower,
            prefix="video_model.model.vision_tower.vision_tower.vision_model"),
        "mm_projector": {"params": {"proj": linear(
            flat, "video_model.model.mm_projector")}},
        "connector": convert_connector(flat, cfg.qformer),
        "unet": convert_unet(flat, cfg.unet,
                             prefix="diffusion_model.model.diffusion_model"),
        "vae": convert_vae(flat, cfg.vae,
                           prefix="diffusion_model.first_stage_model"),
        "clip_text": convert_openclip_text(
            flat, cfg.clip_text.layers - 1,
            prefix="diffusion_model.cond_stage_model.model"),
        "clip_img": convert_openclip_visual(
            flat, cfg.clip_vision.layers,
            prefix="diffusion_model.embedder.model.visual"),
        "resampler": convert_resampler(
            flat, cfg.resampler.depth,
            prefix="diffusion_model.image_proj_model"),
    }


def convert_dynamicrafter(flat: Flat, cfg) -> dict:
    """Standalone DynamiCrafter checkpoint (inference.py:27-52 layout) ->
    DynamiCrafter params."""
    flat = normalize_state_dict(flat)
    return {
        "unet": convert_unet(flat, cfg.unet, prefix="model.diffusion_model"),
        "vae": convert_vae(flat, cfg.vae, prefix="first_stage_model"),
        "clip_text": convert_openclip_text(
            flat, cfg.clip_text.layers - 1, prefix="cond_stage_model.model"),
        "clip_img": convert_openclip_visual(
            flat, cfg.clip_vision.layers, prefix="embedder.model.visual"),
        "resampler": convert_resampler(flat, cfg.resampler.depth,
                                       prefix="image_proj_model"),
    }
