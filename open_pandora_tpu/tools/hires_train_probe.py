"""High-res training proof point: one REAL-TPU finetune step at
576x1024x16f (BASELINE.md config 3 resolution) with gradient checkpointing.

The reference only ever trains this resolution sharded over multi-GPU
nodes with DeepSpeed ZeRO-2 (config/config_finetune.yaml) — the optimizer
state never lives on one device. On a single 16 GB chip the full in-step
pipeline (VAE/CLIP encoders + UNet + AdamW) does not fit; the fitting
configuration is the latent-cached step (train/step.py
make_latent_finetune_step): frozen encoders run once outside the step, the
step holds only UNet params (2.86 GB bf16) + bf16 AdamW moments (5.7 GB) +
rematerialized activations. Multi-chip training uses the normal in-step
pipeline with ZeRO-2 sharding (tests/test_train_step.py, dryrun_multichip).

Measures sec/step and HBM; prints one JSON line.

Usage: python open_pandora_tpu/tools/hires_train_probe.py
       [--height 576 --width 1024] [--steps 3]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])


def phase_precompute(args):
    """Frozen-encoder conditioning in its OWN process: VAE-encode +
    CLIP/Resampler context for one synthetic batch, saved as npz. Running
    it separately leaves the training process's HBM unfragmented."""
    from open_pandora_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pandora_tpu.core.config import PandoraConfig
    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter
    from open_pandora_tpu.models.vae import encode_video

    cfg = PandoraConfig()
    model = DynamiCrafter(cfg, dtype=jnp.bfloat16)
    H, W, T = args.height, args.width, cfg.unet.temporal_length
    enc_params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.init_params(jax.random.PRNGKey(0), height=H, width=W)))()
    jax.block_until_ready(jax.tree_util.tree_leaves(enc_params)[0])
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, T, H, W, 3),
                               jnp.bfloat16) * 2 - 1

    def precompute(params, video):
        z = encode_video(model.vae, params["vae"], video,
                         scale_factor=cfg.diffusion.scale_factor,
                         key=jax.random.PRNGKey(2))
        text_ctx = model.encode_text(params, jnp.zeros(
            (1, cfg.clip_text.context_length), jnp.int32))
        img_ctx = model.encode_image_context(params, (video[:, 0] + 1) / 2)
        z_cond = model.get_latent_z(params, video[:, :1])
        return z, jnp.concatenate([text_ctx, img_ctx], axis=1), z_cond

    z, ctx, z_cond = jax.jit(precompute)(enc_params, video)
    np.savez(args.latents,
             z=np.asarray(z, np.float32),
             ctx=np.asarray(ctx, np.float32),
             z_cond=np.asarray(z_cond, np.float32))
    print(f"[precompute] wrote {args.latents}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--latents", default="/tmp/hires_latents.npz")
    p.add_argument("--phase", choices=["precompute", "train", "both"],
                   default="both")
    p.add_argument("--optimizer", default="adamw8bit",
                   choices=["adamw", "adamw8bit"],
                   help="adamw8bit (default) is the single-chip-fitting "
                        "configuration at 576x1024")
    p.add_argument("--offload", action="store_true",
                   help="AdamW moments resident in pinned host memory "
                        "(make_offloaded_latent_step) — the fallback when "
                        "the device-resident step OOMs HBM (measured "
                        "2026-08-19: resident 8-bit moments + no-donation "
                        "double-buffering exceed 16 GB at 576x1024). "
                        "Measured 2026-08-21: the offloaded module's AOT "
                        "compile kills the axon compile helper (SIGKILL); "
                        "prefer --split on single chip.")
    p.add_argument("--split", action="store_true",
                   help="two-jit grad/update step (make_split_latent_step):"
                        " backward remat temps and optimizer double-buffers"
                        " never share an HBM peak — the configuration that "
                        "fits 576x1024 on one 16 GB chip")
    args = p.parse_args()

    if args.phase == "precompute":
        return phase_precompute(args)
    if args.phase == "both":
        import os
        import subprocess
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", "precompute", "--height", str(args.height),
             "--width", str(args.width), "--latents", args.latents],
            cwd="/root/repo").returncode
        if rc != 0:
            raise RuntimeError(f"precompute phase failed rc={rc}")

    from open_pandora_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pandora_tpu.core.config import PandoraConfig, TrainConfig
    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter
    from open_pandora_tpu.train.step import (TrainState,
                                             make_latent_finetune_step)

    cfg = PandoraConfig()
    assert cfg.unet.use_checkpoint, "remat must be on for 1024 training"
    model = DynamiCrafter(cfg, dtype=jnp.bfloat16)
    H, W, T = args.height, args.width, cfg.unet.temporal_length

    data = np.load(args.latents)
    z = jnp.asarray(data["z"], jnp.bfloat16)
    ctx = jnp.asarray(data["ctx"], jnp.bfloat16)
    z_cond = jnp.asarray(data["z_cond"], jnp.bfloat16)

    unet_params = {"unet": jax.jit(lambda: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, T, args.height // 8, args.width // 8,
                       cfg.unet.in_channels), jnp.bfloat16),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cfg.unet.text_context_len
                       + T * cfg.unet.img_tokens_per_frame,
                       cfg.unet.context_dim), jnp.bfloat16))))()}
    jax.block_until_ready(jax.tree_util.tree_leaves(unet_params)[0])

    # params (2.86G) + bf16 moments (5.7G) + remat temps (~6.6G) + runtime
    # overhead exceeds the 15.75G HBM; 8-bit blockwise moments
    # (train/optim8bit.py) cut optimizer state to 1.45G and fit.
    tcfg = TrainConfig(learning_rate=5e-5, uncond_prob=0.0, max_steps=10,
                       grad_clip_norm=0.5, optimizer=args.optimizer)
    if args.offload:
        from open_pandora_tpu.train.step import make_offloaded_latent_step
        step, tx, put_state = make_offloaded_latent_step(model, tcfg)
    elif args.split:
        from open_pandora_tpu.train.step import make_split_latent_step
        step, tx = make_split_latent_step(model, tcfg)
        put_state = lambda s: s
    else:
        step, tx = make_latent_finetune_step(model, tcfg)
        put_state = lambda s: s
    state = put_state(TrainState.create(unet_params, "dynamicrafter", tx))
    batch = {"z": z, "ctx": ctx, "z_cond": z_cond,
             "fps": jnp.full((1,), 8, jnp.int32)}

    t0 = time.perf_counter()
    try:
        state, m = step(state, batch, jax.random.PRNGKey(3))
        # the host fetch is where a deferred runtime OOM actually surfaces
        # — keep it inside the try so HBM stats still print on failure
        loss0 = float(m["loss"])  # host fetch = sync (compile + step)
    except Exception:
        try:
            ms = jax.devices()[0].memory_stats()
            print({k: round(v / 2**30, 2) for k, v in ms.items()
                   if "bytes" in k}, file=sys.stderr)
        except Exception:
            pass
        raise
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(4)
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
    loss = float(m["loss"])  # chained through state -> true sync
    per_step = (time.perf_counter() - t0) / args.steps

    mem = {}
    try:
        ms = jax.devices()[0].memory_stats()
        mem = {"hbm_peak_gb": round(ms.get("peak_bytes_in_use", 0) / 2**30, 2),
               "hbm_now_gb": round(ms.get("bytes_in_use", 0) / 2**30, 2)}
    except Exception:  # pragma: no cover
        pass

    print(json.dumps({
        "metric": (f"latent_finetune_step_{H}x{W}x{T}f_bs1"
                   + ("_hostoffload" if args.offload else "")
                   + ("_splitstep" if args.split else "")),
        "optimizer": args.optimizer,
        "sec_per_step": round(per_step, 3),
        "compile_s": round(compile_s, 1),
        "loss_first": round(loss0, 4), "loss_last": round(loss, 4),
        **mem,
    }))


if __name__ == "__main__":
    main()
