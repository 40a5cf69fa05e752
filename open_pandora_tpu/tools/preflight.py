"""Real-TPU compile preflight over the FULL product shape matrix.

Round-3 lesson: Mosaic lowering on the CPU host does NOT perform
scoped-VMEM stack allocation, so "lowers clean" proves nothing about the
16 MB scoped-VMEM limit — the round-3 bench died to a kernel-vmem-stack
OOM that only the real-chip compiler raises. This tool AOT-compiles (via
``jax.jit(...).lower(shapes).compile()`` — no params allocated, no
execution) on the real backend:

  phase 1: every packed/fused attention site the product reaches —
           self / text-cross / dual streams at every UNet level of BOTH
           resolutions with the TRUE head counts
           (the shape census of reference openaimodel3d.py:552-607:
           320x512 -> levels (2560,320,5) (640,640,10) (160,1280,20);
           576x1024 -> (9216,320,5) (2304,640,10) (576,1280,20))
  phase 2: the full CFG-pair UNet eval at 320x512 AND 576x1024
  phase 3: VAE decode at both resolutions (product frame chunks 8 / 2)

Exit code 0 = every product shape compiles on this backend. Run this on
the real chip BEFORE any bench; it is the pre-bench checklist item that
replaces "lowers clean" claims.

Usage: python -m open_pandora_tpu.tools.preflight [--skip-model]
       [--only-attention] [--ab-multi]
"""

from __future__ import annotations

import argparse
import sys
import time

# (tokens, hd, heads) for every attention level at both resolutions
PRODUCT_LEVELS = [
    (2560, 320, 5, "320x512 L0"),
    (640, 640, 10, "320x512 L1"),
    (160, 1280, 20, "320x512 L2"),
    (9216, 320, 5, "576x1024 L0"),
    (2304, 640, 10, "576x1024 L1"),
    (576, 1280, 20, "576x1024 L2"),
]
T_FRAMES = 16
B_CFG = 2  # batched CFG pair


def _check(name: str, fn) -> bool:
    t0 = time.perf_counter()
    try:
        fn()
        print(f"PASS {name}  ({time.perf_counter() - t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report every failure, keep going
        msg = f"{type(e).__name__}: {e}"
        print(f"FAIL {name}  ({time.perf_counter() - t0:.1f}s)\n"
              f"     {msg[:500]}", flush=True)
        return False


def preflight_attention(ab_multi: bool = False) -> int:
    import jax
    import jax.numpy as jnp

    from open_pandora_tpu.ops.packed_attention import (
        _single_block_fits, dual_cross_attention_packed,
        packed_attention_eligible, self_attention_packed)

    fails = 0
    b = B_CFG * T_FRAMES  # spatial attention batches b_cfg * T frames
    for n, hd, heads, where in PRODUCT_LEVELS:
        sd = lambda m: jax.ShapeDtypeStruct((b, m, hd), jnp.bfloat16)
        for label, ms in [("self", (n,)), ("xtext", (77,)),
                          ("dual", (77, 16))]:
            if not packed_attention_eligible(n, ms, heads, hd):
                print(f"SKIP {where} {label} (routed to XLA/flash path)")
                continue
            if label == "dual":
                fn = jax.jit(lambda q, kt, vt, ki, vi:
                             dual_cross_attention_packed(
                                 q, kt, vt, ki, vi, jnp.ones(()),
                                 heads=heads))
                args = (sd(n), sd(77), sd(77), sd(16), sd(16))
            else:
                fn = jax.jit(lambda q, k, v: self_attention_packed(
                    q, k, v, heads=heads))
                args = (sd(n), sd(ms[0]), sd(ms[0]))
            regime = ("single" if label != "self"
                      or _single_block_fits(n, ms, heads) else "multi")
            ok = _check(f"attn {where} {label} ({regime}, "
                        f"n={n} hd={hd} h={heads})",
                        lambda: fn.lower(*args).compile())
            fails += not ok
            if (ab_multi and label == "self"
                    and regime == "single" and n >= 2048):
                # A/B: the same shape through the multi-KV-block kernel
                import os
                os.environ["PANDORA_PACKED_FORCE_MULTI"] = "1"
                try:
                    fn2 = jax.jit(lambda q, k, v: self_attention_packed(
                        q, k, v, heads=heads))
                    fails += not _check(
                        f"attn {where} self (FORCED multi)",
                        lambda: fn2.lower(*args).compile())
                finally:
                    del os.environ["PANDORA_PACKED_FORCE_MULTI"]
    return fails


def conv_census():
    """Trace the full UNet at both product resolutions with the census
    hook on; returns every _SConv3x3 (h, w, cin, cout) the product reaches
    (a hand-maintained shape list missed the Upsample convs — the
    2026-08-19 scoped-VMEM OOM at output_blocks_5_up)."""
    import os

    import jax
    import jax.numpy as jnp

    from open_pandora_tpu.core.config import PandoraConfig
    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter
    from open_pandora_tpu.ops import conv2d

    cfg = PandoraConfig()
    dc = DynamiCrafter(cfg, dtype=jnp.bfloat16)
    T = cfg.unet.temporal_length
    ctx_len = cfg.unet.text_context_len + T * cfg.unet.img_tokens_per_frame
    os.environ["PANDORA_CONV_CENSUS"] = "1"
    conv2d.CENSUS.clear()
    try:
        for height, width in [(320, 512), (576, 1024)]:
            hz, wz = height // 8, width // 8
            jax.eval_shape(
                dc.unet.init, jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct((B_CFG, T, hz, wz,
                                      cfg.unet.in_channels), jnp.bfloat16),
                jax.ShapeDtypeStruct((B_CFG,), jnp.int32),
                jax.ShapeDtypeStruct((B_CFG, ctx_len, cfg.unet.context_dim),
                                     jnp.bfloat16))
    finally:
        del os.environ["PANDORA_CONV_CENSUS"]
    return sorted(conv2d.CENSUS)


def preflight_conv() -> int:
    """Compile every Pallas-ROUTABLE product conv shape (ops/conv2d.py),
    enumerated by tracing the UNet itself. The kernel is opt-in for the
    product path (round-4 in-program negative result, PERF.md), but the
    preflight keeps compiling the full matrix so PANDORA_ENABLE_PCONV /
    PANDORA_PCONV_ONLY experiments stay safe at every shape."""
    import os

    import jax
    import jax.numpy as jnp

    from open_pandora_tpu.ops.conv2d import (_MOSAIC_DENY, _choose_blocks,
                                             _split_point, conv3x3_eligible,
                                             conv3x3_nhwc)

    os.environ.setdefault("PANDORA_ENABLE_PCONV", "1")
    b = B_CFG * T_FRAMES
    fails = 0
    for (h, w, c, co) in conv_census():
        if not conv3x3_eligible(h, w, c, co):
            print(f"SKIP conv {h}x{w} c{c}->co{co} -> XLA")
            continue
        blk = (f"split@{_split_point(h, w, c, co)}"
               if (h, w, c) in _MOSAIC_DENY else _choose_blocks(h, w, c, co))
        x_sd = jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16)
        w_sd = jax.ShapeDtypeStruct((3, 3, c, co), jnp.float32)
        b_sd = jax.ShapeDtypeStruct((co,), jnp.float32)
        fn = jax.jit(conv3x3_nhwc)
        fails += not _check(
            f"conv {h}x{w} c{c}->co{co} blk={blk}",
            lambda: fn.lower(x_sd, w_sd, b_sd).compile())
    return fails


def preflight_model(height: int, width: int) -> int:
    import jax
    import jax.numpy as jnp

    from open_pandora_tpu.core.config import PandoraConfig
    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter

    cfg = PandoraConfig()
    dc = DynamiCrafter(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: dc.init_params(jax.random.PRNGKey(0),
                               height=height, width=width))
    as_bf16 = lambda s: jax.ShapeDtypeStruct(
        s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype)
    u_sd = {"unet": jax.tree_util.tree_map(as_bf16, shapes["unet"])}
    v_sd = {"vae": jax.tree_util.tree_map(as_bf16, shapes["vae"])}

    T = cfg.unet.temporal_length
    hz, wz = height // 8, width // 8
    ctx_len = cfg.unet.text_context_len + T * cfg.unet.img_tokens_per_frame
    bf = jnp.bfloat16
    x_sd = jax.ShapeDtypeStruct((B_CFG, T, hz, wz, 4), bf)
    ctx_sd = jax.ShapeDtypeStruct((B_CFG, ctx_len, cfg.unet.context_dim), bf)
    t_sd = jax.ShapeDtypeStruct((B_CFG,), jnp.int32)

    fails = 0
    f = jax.jit(lambda p, x, t, c, zc, fs:
                dc.apply_model(p, x, t, c, zc, fs=fs))
    fails += not _check(
        f"UNet CFG-pair eval {height}x{width}",
        lambda: f.lower(u_sd, x_sd, t_sd, ctx_sd, x_sd, t_sd).compile())

    chunk = 8 if height <= 320 else 2
    z_sd = jax.ShapeDtypeStruct((1, T, hz, wz, 4), bf)
    g = jax.jit(lambda p, z: dc.decode(p, z, frame_chunk=chunk))
    fails += not _check(
        f"VAE decode {height}x{width} (chunk {chunk})",
        lambda: g.lower({**u_sd, **v_sd}, z_sd).compile())
    return fails


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-model", action="store_true",
                    help="attention-site sweep only (fast)")
    ap.add_argument("--only-attention", action="store_true",
                    help="alias for --skip-model")
    ap.add_argument("--ab-multi", action="store_true",
                    help="also compile forced-multi A/B at big self-attn")
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    if not args.no_cache:
        from open_pandora_tpu.core.cache import enable_compilation_cache
        enable_compilation_cache()

    import jax
    print(f"backend: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})", flush=True)

    fails = preflight_attention(ab_multi=args.ab_multi)
    fails += preflight_conv()
    if not (args.skip_model or args.only_attention):
        for h, w in [(320, 512), (576, 1024)]:
            fails += preflight_model(h, w)

    print(f"preflight: {'GREEN' if fails == 0 else f'{fails} FAILURES'}",
          flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
