"""Standalone DynamiCrafter batch inference over a prompt directory.

Behavioral spec: /root/reference/DynamiCrafter/scripts/evaluation/
inference.py:242-311 + ddp_wrapper.py — prompt dir of images + a
test_prompts.txt, rank-sharded list (inference.py:276-282), per-prompt
image_guided_synthesis + mp4 save; and run.sh defaults (ugs 7.5, DDIM 50,
guidance_rescale 0.7, perframe_ae).

The NCCL/ddp_wrapper launch becomes jax.process_index sharding — pure data
parallelism (the reference has no inter-rank communication after init
either, SURVEY.md §3.5).

Usage:
  python -m open_pandora_tpu.eval.inference --prompt-dir DIR --save-dir OUT \
      [--ckpt PATH] [--ddim-steps 50] [--ugs 7.5] [--guidance-rescale 0.7]
      [--height 320 --width 512] [--frame-stride 3] [--debug]
"""

from __future__ import annotations

import argparse
import os
import sys


def load_prompt_list(prompt_dir: str):
    """inference.py:60-75: images + a .txt of prompts, paired by order."""
    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    images = sorted(f for f in os.listdir(prompt_dir)
                    if f.lower().endswith(exts))
    prompts = [os.path.splitext(f)[0].replace("_", " ") for f in images]
    txts = [f for f in os.listdir(prompt_dir) if f.endswith(".txt")]
    if txts:
        with open(os.path.join(prompt_dir, txts[0])) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        if len(lines) >= len(images):
            prompts = lines[: len(images)]
    return list(zip(images, prompts))


def build_parser():
    p = argparse.ArgumentParser("dynamicrafter-inference")
    p.add_argument("--prompt-dir", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--ddim-steps", type=int, default=50)
    p.add_argument("--ugs", type=float, default=7.5)
    p.add_argument("--guidance-rescale", type=float, default=0.7)
    p.add_argument("--cfg-img", type=float, default=None,
                   help="3-way CFG image guidance (multicond sampler)")
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--fs", type=int, default=3, help="frame stride cond")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--n-samples", type=int, default=1)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--save-fps", type=int, default=8)
    p.add_argument("--debug", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from open_pandora_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from open_pandora_tpu.parallel.launch import init_distributed
    init_distributed()

    import dataclasses
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter
    from open_pandora_tpu.parallel.mesh import process_shard_indices
    from open_pandora_tpu.pipeline.preprocess import (clip_resampler_preprocess,
                                                      diffusion_preprocess)
    from open_pandora_tpu.pipeline.tokenizers import load_clip_tokenizer
    clip_encode = load_clip_tokenizer()
    from open_pandora_tpu.utils.video_io import frames_to_uint8, write_video

    if args.debug:
        from tests.test_dynamicrafter import TINY as cfg, H, W
        height, width = H, W
        args.ddim_steps = min(args.ddim_steps, 2)
        dtype = jnp.float32
    else:
        from open_pandora_tpu.core.config import PandoraConfig
        cfg = PandoraConfig()
        height, width = args.height, args.width
        dtype = jnp.bfloat16

    model = DynamiCrafter(cfg, dtype=dtype)
    if args.ckpt:
        from open_pandora_tpu.core.checkpoint import load_torch_flat, restore_params
        from open_pandora_tpu.core.convert import convert_dynamicrafter
        try:
            params = restore_params(args.ckpt)
        except Exception:
            params = jax.tree_util.tree_map(
                jnp.asarray, convert_dynamicrafter(load_torch_flat(args.ckpt),
                                                   cfg))
    else:
        print("[inference] NO CHECKPOINT — random weights (smoke mode)",
              flush=True)
        params = model.init_params(jax.random.PRNGKey(0), height=height,
                                   width=width)

    items = load_prompt_list(args.prompt_dir)
    shard = [items[i] for i in process_shard_indices(len(items))]
    os.makedirs(args.save_dir, exist_ok=True)
    ctx_len = cfg.clip_text.context_length

    t0 = time.time()
    for img_name, prompt in shard:
        img = Image.open(os.path.join(args.prompt_dir, img_name))
        tokens = jnp.asarray([clip_encode(prompt, ctx_len)], jnp.int32)
        text_ctx = model.encode_text(params, tokens)
        cond_img = jnp.asarray(clip_resampler_preprocess(img))[None]
        cond_frames = jnp.asarray(
            diffusion_preprocess(img, (height, width)))[None, None]
        for s in range(args.n_samples):
            z = model.image_guided_synthesis(
                params, text_context=text_ctx, cond_images=cond_img,
                cond_frames=cond_frames,
                key=jax.random.PRNGKey(args.seed + s),
                ddim_steps=args.ddim_steps, guidance_scale=args.ugs,
                eta=args.eta, fs=args.fs, cfg_img=args.cfg_img,
                guidance_rescale=args.guidance_rescale)
            chunk = 8 if (height * width <= 320 * 512
                          and z.shape[1] % 8 == 0) else 1
            video = model.decode(params, z, frame_chunk=chunk)
            frames = frames_to_uint8(np.asarray(video[0]))
            name = os.path.splitext(img_name)[0]
            suffix = f"_{s}" if args.n_samples > 1 else ""
            write_video(os.path.join(args.save_dir, f"{name}{suffix}.mp4"),
                        frames, fps=args.save_fps)
        print(f"[inference] {img_name} done", flush=True)
    print(f"[inference] total {time.time() - t0:.1f}s for {len(shard)} prompts",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
