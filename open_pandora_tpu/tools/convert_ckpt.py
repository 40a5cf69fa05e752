"""Checkpoint converter CLI — torch (HF/PL/DeepSpeed) -> Orbax.

Replaces /root/reference/tools/ckpt2bin.py and pt2bin.py (PL/DeepSpeed ->
pytorch_model.bin) with a direct torch -> JAX/Orbax conversion; the dialect
stripping they implement lives in core.convert.normalize_state_dict.

Usage:
  python -m open_pandora_tpu.tools.convert_ckpt --src PATH --dst DIR \
      [--family world_model|dynamicrafter] [--dry-run]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser("convert-ckpt")
    p.add_argument("--src", required=True,
                   help="torch .bin/.pt/.ckpt/.safetensors file or HF dir")
    p.add_argument("--dst", required=True, help="output Orbax directory")
    p.add_argument("--family", default="world_model",
                   choices=["world_model", "dynamicrafter"])
    p.add_argument("--dry-run", action="store_true",
                   help="convert + report leaf count, no write")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from open_pandora_tpu.core.checkpoint import load_torch_flat, save_params
    from open_pandora_tpu.core.config import PandoraConfig
    from open_pandora_tpu.core.convert import (convert_dynamicrafter,
                                               convert_world_model)

    cfg = PandoraConfig()
    flat = load_torch_flat(args.src)
    print(f"[convert] loaded {len(flat)} torch tensors from {args.src}")
    conv = (convert_world_model if args.family == "world_model"
            else convert_dynamicrafter)
    params = conv(flat, cfg)
    leaves = jax.tree_util.tree_leaves(params)
    n = sum(int(np.prod(l.shape)) for l in leaves)
    print(f"[convert] {len(leaves)} leaves, {n/1e9:.3f}B params")
    if not args.dry_run:
        save_params(args.dst, params)
        print(f"[convert] wrote {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
