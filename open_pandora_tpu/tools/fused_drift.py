"""Measure the shipped bf16 fused fast path's ACTUAL drift vs the all-XLA
bf16 path over a full product clip (VERDICT r2 weak #3 / next #9).

The fused kernels (flash attention, dual cross-attention, fused GroupNorm,
fused temporal attention) are gated per-process by PANDORA_DISABLE_FUSED,
read at trace time — so the A/B must be two processes. This tool runs the
same seeded DDIM synthesis (random weights, fixed PRNG keys, identical
inputs) in two subprocesses and diffs the resulting latents + decoded
frames. Record the numbers in PARITY.md once per round.

Usage (on the real TPU chip):
    python -m open_pandora_tpu.tools.fused_drift [--ddim-steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile


def _worker(out_path: str, ddim_steps: int, height: int, width: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pandora_tpu.core.cache import enable_compilation_cache
    from open_pandora_tpu.core.config import PandoraConfig
    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter

    enable_compilation_cache()
    cfg = PandoraConfig()
    dc = DynamiCrafter(cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        dc.init_params(jax.random.PRNGKey(0), height=height, width=width)))()
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])

    tctx = jax.random.normal(
        jax.random.PRNGKey(11),
        (1, cfg.unet.text_context_len, cfg.unet.context_dim),
        jnp.float32).astype(jnp.bfloat16) * 0.2
    ci = (jax.random.uniform(jax.random.PRNGKey(12), (1, height, width, 3))
          .astype(jnp.bfloat16))
    cf = (jax.random.uniform(jax.random.PRNGKey(13),
                             (1, 1, height, width, 3)) * 2 - 1
          ).astype(jnp.bfloat16)

    z = jax.jit(lambda p: dc.image_guided_synthesis(
        p, text_context=tctx, cond_images=ci, cond_frames=cf,
        key=jax.random.PRNGKey(42), ddim_steps=ddim_steps,
        guidance_scale=7.5, eta=1.0, fs=15))(params)
    frames = jax.jit(lambda p, zz: dc.decode(p, zz, frame_chunk=8))(params, z)
    np.savez(out_path, z=np.asarray(z, np.float32),
             frames=np.asarray(frames, np.float32))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ddim-steps", type=int, default=10)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--worker-out", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker_out:
        _worker(args.worker_out, args.ddim_steps, args.height, args.width)
        return

    import numpy as np

    outs = {}
    with tempfile.TemporaryDirectory(prefix="fused_drift_") as td:
        for label, disable in (("fused", ""), ("xla", "1")):
            env = dict(os.environ)
            if disable:
                env["PANDORA_DISABLE_FUSED"] = disable
            else:
                env.pop("PANDORA_DISABLE_FUSED", None)
            out = os.path.join(td, label + ".npz")
            rc = subprocess.run(
                [sys.executable, "-m", "open_pandora_tpu.tools.fused_drift",
                 "--ddim-steps", str(args.ddim_steps),
                 "--height", str(args.height), "--width", str(args.width),
                 "--worker-out", out],
                env=env, cwd=os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))))).returncode
            if rc != 0:
                raise SystemExit(f"{label} worker failed rc={rc}")
            outs[label] = dict(np.load(out))

    rep = {"ddim_steps": args.ddim_steps,
           "shape": list(outs["fused"]["z"].shape)}
    for key in ("z", "frames"):
        a, b = outs["fused"][key], outs["xla"][key]
        d = np.abs(a - b)
        scale = float(np.abs(b).mean())
        rep[key] = {
            "max_abs": float(d.max()),
            "mean_abs": float(d.mean()),
            "rel_mean": float(d.mean() / max(scale, 1e-12)),
        }
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
