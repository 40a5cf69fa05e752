"""Training entrypoint — replaces the reference's PL/DeepSpeed stack.

Behavioral spec: /root/reference/trainer.py:24-105 (OmegaConf merge, workspace
init, Trainer construction, fit), utils/utils_train.py (workspace layout
{logdir}/{name}/{checkpoints,configs,loginfo} :9-26, checkpoint cadence
:35-88, logger :90-121, strategy :123-134), config/config*.yaml stage
settings, model.py:926-975 (training_step + optimizers).

Usage:
  python -m open_pandora_tpu.train.trainer --name run1 --logdir ./runs \
      [--config cfg.yaml]... [--set train.stage=finetune] [--ckpt path] \
      [--synthetic-data] [--meta-path meta.csv --data-dir /data/webvid]

Stages (train.stage):
  alignment      — connector only, KL vs OpenCLIP (config_align.yaml)
  finetune       — UNet + connector, diffusion loss (config.yaml)
  dynamicrafter  — UNet only, no LLM in the loop
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Optional

log = logging.getLogger("open_pandora_tpu.train")


def init_workspace(logdir: str, name: str, cfg) -> dict:
    """utils_train.py:9-26: create {checkpoints, configs, loginfo}; only
    process 0 writes the config."""
    import dataclasses

    import jax

    root = os.path.join(logdir, name)
    dirs = {k: os.path.join(root, k)
            for k in ("checkpoints", "configs", "loginfo")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    if jax.process_index() == 0:
        with open(os.path.join(dirs["configs"], "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    dirs["root"] = root
    return dirs


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """The reference declares auto-resume but never implements it
    (trainer.py:35-36 parsed-and-ignored; gradio_app.py:117 calls an
    undefined function). Implemented for real here."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_") and d[5:].isdigit():
            steps.append(int(d[5:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def build_parser():
    p = argparse.ArgumentParser("open-pandora-tpu-trainer")
    p.add_argument("--name", default=time.strftime("run_%Y%m%dT%H%M%S"))
    p.add_argument("--logdir", default="./runs")
    p.add_argument("--config", action="append", default=[])
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   help="dotted config overrides, e.g. train.stage=alignment")
    p.add_argument("--ckpt", default=None, help="initial params (orbax/torch)")
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--meta-path", default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--sample-every", type=int, default=0,
                   help="every N steps, decode a sample clip to a PNG grid "
                        "(the reference's ImageLogger, utils/callbacks.py:15)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (smoke mode)")
    p.add_argument("--logger", default="tensorboard",
                   help="comma list of metric backends besides metrics.jsonl:"
                        " tensorboard (default, reference utils_train.py:95),"
                        " csv, wandb, none")
    p.add_argument("--chat-path", action="append", default=[],
                   help="conversation JSON file(s) for train.stage=llm_sft "
                        "(ChatUniVi LazySupervisedDataset records)")
    p.add_argument("--image-root", default=None)
    p.add_argument("--video-root", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from open_pandora_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from open_pandora_tpu.parallel.launch import init_distributed
    init_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pandora_tpu.core.config import load_config
    from open_pandora_tpu.core.checkpoint import (restore_params, save_params)
    from open_pandora_tpu.data.webvid import (PrefetchLoader,
                                              SyntheticVideoDataset,
                                              WebVidDataset)
    from open_pandora_tpu.parallel.mesh import build_mesh
    from open_pandora_tpu.train.step import (TrainState, make_alignment_step,
                                             make_finetune_step,
                                             make_wm_finetune_step)

    if args.tiny:
        import dataclasses
        from tests.test_llm_stack import TINY_LLAMA, TINY_QF, TINY_CONN
        from tests.test_dynamicrafter import TINY as TINY_DC, H, W
        from open_pandora_tpu.core.config import (CLIPTowerConfig,
                                                  ClusterConfig)
        cfg = dataclasses.replace(
            TINY_DC, llama=TINY_LLAMA,
            clip_tower=CLIPTowerConfig(image_size=28, patch_size=14, width=64,
                                       layers=2, heads=2),
            cluster=ClusterConfig(spatial_rates=(2, 1, 1), temporal_rate=0.5),
            qformer=TINY_QF, connector=TINY_CONN)
        cfg = load_config((), args.overrides, base=cfg)
        height, width = H, W
        clip_size = 28
        video_len = cfg.unet.temporal_length
    else:
        cfg = load_config(args.config, args.overrides)
        height, width = cfg.train.height, cfg.train.width
        clip_size = 224
        video_len = cfg.train.video_length

    tcfg = cfg.train
    if args.max_steps is not None:
        import dataclasses
        tcfg = dataclasses.replace(tcfg, max_steps=args.max_steps)

    ws = init_workspace(args.logdir, args.name, cfg)
    mesh = build_mesh(cfg.mesh)
    stage = tcfg.stage
    log.info("stage=%s mesh=%s devices=%d", stage, dict(mesh.mesh.shape),
             len(jax.devices()))

    # -- model + params
    if stage in ("alignment", "finetune", "llm_sft"):
        from open_pandora_tpu.models.world_model import WorldModel
        wm = WorldModel(cfg)
        model = wm.diffusion
        params = wm.init_params(jax.random.PRNGKey(tcfg.seed),
                                height=height, width=width)
    else:  # dynamicrafter
        from open_pandora_tpu.models.dynamicrafter import DynamiCrafter
        wm = None
        model = DynamiCrafter(cfg)
        params = model.init_params(jax.random.PRNGKey(tcfg.seed),
                                   height=height, width=width)
    if args.ckpt:
        params = restore_params(args.ckpt, like=params)

    # -- step fn
    if stage == "alignment":
        step_fn, tx = make_alignment_step(wm, tcfg, mesh_spec=mesh)
        stage_key = "alignment"
    elif stage == "finetune":
        step_fn, tx = make_wm_finetune_step(wm, tcfg, mesh_spec=mesh)
        stage_key = "finetune"
    elif stage == "llm_sft":
        from open_pandora_tpu.train.llm_step import make_llm_sft_step
        step_fn, tx = make_llm_sft_step(wm, tcfg, mesh_spec=mesh)
        stage_key = ("llm_sft_lora" if cfg.llama.lora_rank > 0
                     else "llm_sft")
    else:
        step_fn, tx = make_finetune_step(model, tcfg, mesh_spec=mesh,
                                         stage="dynamicrafter")
        stage_key = "dynamicrafter"
    state = TrainState.create(params, stage_key, tx, use_ema=tcfg.use_ema)
    state = step_fn.shard_state(state)

    start_step = 0
    if args.auto_resume:
        latest = find_latest_checkpoint(ws["checkpoints"])
        if latest:
            log.info("resuming from %s", latest)
            state = state.replace(trainable=restore_params(
                latest, like=state.trainable))
            start_step = int(os.path.basename(latest)[5:])
            state = state.replace(step=jnp.asarray(start_step, jnp.int32))

    # -- data
    text_len = cfg.clip_text.context_length
    batch_global = tcfg.batch_size_per_device * mesh.n_data
    if stage == "llm_sft":
        from open_pandora_tpu.data.sft import (ConversationDataset,
                                               synthetic_conversations)
        from open_pandora_tpu.pipeline.tokenizers import load_tokenizer
        sft_ds = ConversationDataset(
            args.chat_path, load_tokenizer(),
            image_root=args.image_root, video_root=args.video_root,
            clip_size=clip_size, seed=tcfg.seed,
            records=(synthetic_conversations(8 * batch_global, tcfg.seed)
                     if not args.chat_path else None))

        class _SFTLoader:
            def epoch(self, _i):
                return sft_ds.batches(batch_global, cfg, bucket=32,
                                      drop_remainder=mesh.n_data > 1)

        loader = _SFTLoader()
    else:
        if args.synthetic_data or not args.meta_path:
            ds = SyntheticVideoDataset(video_length=video_len,
                                       resolution=(height, width),
                                       clip_size=clip_size)
        else:
            ds = WebVidDataset(args.meta_path, args.data_dir,
                               video_length=video_len,
                               resolution=(height, width),
                               frame_stride=tcfg.frame_stride,
                               fixed_fps=tcfg.fixed_fps, seed=tcfg.seed)
        llm_tok = None
        if stage in ("alignment", "finetune"):
            # fixed-length (bucketed) LLaMA prompt text; the fallback
            # tokenizer stands in when no sentencepiece assets are present
            from open_pandora_tpu.pipeline.tokenizers import load_tokenizer
            llm_tok = load_tokenizer()
        loader = PrefetchLoader(ds, batch_global, text_len=text_len,
                                llm_tokenizer=llm_tok)

    # -- loop
    metrics = None
    if jax.process_index() == 0:
        from open_pandora_tpu.utils.loggers import MetricsLogger
        metrics = MetricsLogger(ws["loginfo"], backends=args.logger)
    key = jax.random.PRNGKey(tcfg.seed)
    step_i = start_step
    t_last = time.time()
    done = False
    epoch = 0
    while not done:
        for batch in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            state, m = step_fn(state, batch, sub)
            step_i += 1
            if step_i % tcfg.log_every == 0 or step_i == 1:
                m = {k: float(v) for k, v in m.items()}
                dt = time.time() - t_last
                t_last = time.time()
                rec = {"sec_per_step": dt / tcfg.log_every, **m}
                log.info("%s", {"step": step_i, **rec})
                if metrics is not None:
                    metrics.log(step_i, rec)
            if (args.sample_every and step_i % args.sample_every == 0
                    and jax.process_index() == 0
                    and stage in ("finetune", "dynamicrafter")):
                from open_pandora_tpu.models.encoders import empty_prompt_tokens
                from open_pandora_tpu.utils.image_grid import save_sample_grid
                sp = {**state.trainable, **state.frozen}
                text_ctx = model.encode_text(sp, empty_prompt_tokens(
                    1, cfg.clip_text.context_length))
                z = model.image_guided_synthesis(
                    sp, text_context=text_ctx,
                    cond_images=jnp.asarray(batch["cond_images"][:1]),
                    cond_frames=jnp.asarray(batch["cond_frames"][:1]),
                    key=jax.random.PRNGKey(0), ddim_steps=10,
                    guidance_scale=cfg.sampler.guidance_scale)
                vid = model.decode(sp, z)
                p = save_sample_grid(
                    os.path.join(ws["loginfo"], f"sample_step{step_i}.png"),
                    np.asarray(vid))
                log.info("sample grid -> %s", p)
            if step_i % tcfg.ckpt_every == 0 and jax.process_index() == 0:
                save_params(ws["checkpoints"], jax.device_get(state.trainable),
                            step=step_i)
                log.info("checkpoint @ step %d", step_i)
            if step_i >= tcfg.max_steps:
                done = True
                break
        epoch += 1
    if jax.process_index() == 0:
        save_params(ws["checkpoints"], jax.device_get(state.trainable),
                    step=step_i)
    if metrics is not None:
        metrics.close()
    log.info("done at step %d", step_i)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
