"""High-res training proof point: one REAL-TPU finetune step at
576x1024x16f (BASELINE.md config 3 resolution) with gradient checkpointing.

Measures sec/step and device HBM after the step; prints one JSON line so
the result can be recorded in BENCH/PARITY notes. The reference trains
this resolution via config_finetune.yaml (1024x576, video_length 16,
DeepSpeed ZeRO-2, 16-mixed) on multi-GPU nodes; this probe demonstrates the
single-chip TPU step (dynamicrafter stage: UNet params + grads + AdamW
state, bf16 params) fits and times it.

Usage: python tools/hires_train_probe.py [--height 576 --width 1024]
       [--bf16-params] (default on; fp32 params need >16 GB at this res)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args()

    from open_pandora_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pandora_tpu.core.config import PandoraConfig, TrainConfig
    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter
    from open_pandora_tpu.train.step import TrainState, make_finetune_step

    cfg = PandoraConfig()
    assert cfg.unet.use_checkpoint, "remat must be on for 1024 training"
    model = DynamiCrafter(cfg, dtype=jnp.bfloat16)
    H, W, T = args.height, args.width, cfg.unet.temporal_length

    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.init_params(jax.random.PRNGKey(0), height=H, width=W)))()
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])

    tcfg = TrainConfig(learning_rate=5e-5, uncond_prob=0.1, max_steps=10,
                       grad_clip_norm=0.5)
    step, tx = make_finetune_step(model, tcfg)
    state = TrainState.create(params, "dynamicrafter", tx)

    k = jax.random.PRNGKey(1)
    batch = {
        "video": jax.random.uniform(k, (1, T, H, W, 3), jnp.bfloat16) * 2 - 1,
        "cond_frames": jax.random.uniform(k, (1, 1, H, W, 3),
                                          jnp.bfloat16) * 2 - 1,
        "cond_images": jax.random.uniform(k, (1, H, W, 3), jnp.bfloat16),
        "text_tokens": jnp.zeros((1, cfg.clip_text.context_length),
                                 jnp.int32),
        "fps": jnp.full((1,), 8, jnp.int32),
    }

    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(2))
    loss0 = float(m["loss"])  # host fetch = sync (compile + step)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(3)
    for i in range(args.steps):
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
        "metric": f"finetune_step_{H}x{W}x{T}f_bs1",
        "sec_per_step": round(per_step, 3),
        "compile_s": round(compile_s, 1),
        "loss_first": round(loss0, 4), "loss_last": round(loss, 4),
        **mem,
    }))


if __name__ == "__main__":
    main()
