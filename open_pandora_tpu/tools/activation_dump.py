"""Per-module activation dumping — the golden-parity diff tool.

SURVEY.md §7.2 item 1: fp32 frame-for-frame parity vs the PyTorch reference
requires activation-level diffing. This captures every flax module's output
during a forward pass and writes them to an .npz keyed by module path, so a
torch-side hook dump (same inputs, released weights) can be compared
module-by-module to localize the first divergence.

Usage (library):
    from open_pandora_tpu.tools.activation_dump import capture, save_npz
    acts = capture(model, params, x, t, ctx)       # {path: array}
    save_npz("jax_acts.npz", acts)

CLI (dumps a UNet forward on synthetic inputs, fp32 golden mode):
    python -m open_pandora_tpu.tools.activation_dump --out acts.npz \
        [--height 320 --width 512] [--tiny]
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict

import numpy as np


def capture(model, params, *args, method=None, **kwargs) -> Dict[str, np.ndarray]:
    """Run `model.apply` with intermediate capture; returns a flat
    {module/path: last_output_array} dict (fp32 numpy)."""
    import jax

    out, mods = model.apply(params, *args, method=method,
                            capture_intermediates=True, mutable=["intermediates"],
                            **kwargs)
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            # capture stores a tuple of call outputs; keep the last call
            leaf = node[-1]
            if hasattr(leaf, "shape"):
                flat["/".join(path)] = np.asarray(
                    jax.device_get(leaf), dtype=np.float32)
        elif hasattr(node, "shape"):
            flat["/".join(path)] = np.asarray(
                jax.device_get(node), dtype=np.float32)

    walk(mods["intermediates"], ())
    flat["__output__"] = np.asarray(jax.device_get(out), dtype=np.float32)
    return flat


def save_npz(path: str, acts: Dict[str, np.ndarray]) -> str:
    np.savez_compressed(path, **acts)
    return path


def diff_npz(a_path: str, b_path: str, top: int = 20):
    """Compare two dumps; print the largest relative divergences in
    topological (name) order so the FIRST bad module is visible."""
    a = np.load(a_path)
    b = np.load(b_path)
    rows = []
    for k in sorted(set(a.files) & set(b.files)):
        if a[k].shape != b[k].shape:
            rows.append((k, float("inf"), f"shape {a[k].shape} vs {b[k].shape}"))
            continue
        denom = max(float(np.abs(b[k]).max()), 1e-8)
        rel = float(np.abs(a[k] - b[k]).max()) / denom
        rows.append((k, rel, ""))
    for k, rel, note in rows[:top] if top else rows:
        print(f"{rel:12.3e}  {k} {note}")
    missing = set(a.files) ^ set(b.files)
    if missing:
        print(f"[diff] {len(missing)} keys only on one side")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser("activation-dump")
    p.add_argument("--out", required=True)
    p.add_argument("--diff", nargs=2, metavar=("A", "B"),
                   help="instead of dumping: diff two npz dumps")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.diff:
        diff_npz(*args.diff)
        return 0

    import jax
    import jax.numpy as jnp

    from open_pandora_tpu.models.unet3d import UNetModel

    if args.tiny:
        from tests.test_unet3d import TINY as cfg
        h, w, T = 8, 8, 4
        ctx_len = cfg.text_context_len + T * cfg.img_tokens_per_frame
    else:
        from open_pandora_tpu.core.config import UNet3DConfig
        cfg = UNet3DConfig()
        h, w = args.height // 8, args.width // 8
        T = cfg.temporal_length
        ctx_len = cfg.text_context_len + T * cfg.img_tokens_per_frame

    model = UNetModel(cfg, dtype=jnp.float32)  # golden fp32
    key = jax.random.PRNGKey(args.seed)
    x = jax.random.normal(key, (1, T, h, w, cfg.in_channels))
    ctx = jax.random.normal(jax.random.fold_in(key, 1),
                            (1, ctx_len, cfg.context_dim))
    ts = jnp.array([500], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx)
    acts = capture(model, params, x, ts, ctx)
    save_npz(args.out, acts)
    print(f"[dump] {len(acts)} activations -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
