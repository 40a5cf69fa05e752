"""Real-TPU A/B: Pallas conv3x3 vs XLA conv at every product ResBlock
shape (the conv-MXU attack of PERF.md round 4).

Methodology matches bench.py: iterations chained through a data
dependency, each variant ends with a host fetch (the axon tunnel acks
dispatch on block_until_ready).

Usage: python -m open_pandora_tpu.tools.conv_bench [--iters 20]
"""

from __future__ import annotations

import argparse
import time

# (B, H, W, C, Co, label) — B = 2 CFG x 16 frames
SHAPES = [
    (32, 40, 64, 320, 320, "320x512 L0 res"),
    (32, 40, 64, 640, 320, "320x512 L0 dec-concat"),
    (32, 20, 32, 640, 640, "320x512 L1 res"),
    (32, 20, 32, 1280, 640, "320x512 L1 dec-concat"),
    (32, 36, 64, 640, 640, "576x1024 L1 res"),
    (32, 72, 128, 320, 320, "576x1024 L0 res"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from open_pandora_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pandora_tpu.ops.conv2d import conv3x3_eligible, conv3x3_nhwc

    # the tool's whole purpose is A/B-ing the (opt-in) kernel
    os.environ.setdefault("PANDORA_ENABLE_PCONV", "1")

    print(f"backend: {jax.devices()[0].device_kind}", flush=True)

    def timed(fn, x, w, b):
        f = jax.jit(fn)
        y = f(x, w, b)
        np.asarray(y[0, 0, 0, 0])  # warm + sync
        t0 = time.perf_counter()
        xi = x
        for _ in range(args.iters):
            y = f(xi, w, b)
            xi = xi + (y[..., :xi.shape[-1]].sum() * 0).astype(xi.dtype)
        np.asarray(y[0, 0, 0, 0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    def xla_conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(x.dtype)

    for (B, H, W, C, Co, label) in SHAPES:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(ks[0], (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.02
        b = jax.random.normal(ks[2], (Co,), jnp.float32)
        tflop = 2 * B * H * W * 9 * C * Co / 1e12

        t_xla = timed(xla_conv, x, w, b)
        row = (f"{label:24s} ({H}x{W} c{C}->co{Co})  "
               f"xla {t_xla:7.3f} ms ({tflop / t_xla * 1e3:5.1f} TF/s)")
        if conv3x3_eligible(H, W, C, Co):
            t_pal = timed(conv3x3_nhwc, x, w, b)
            # numerics sanity at the real shape
            yp = jax.jit(conv3x3_nhwc)(x, w, b)
            yx = jax.jit(xla_conv)(x, w, b)
            err = float(jnp.max(jnp.abs(yp.astype(jnp.float32)
                                        - yx.astype(jnp.float32))))
            row += (f"  pallas {t_pal:7.3f} ms "
                    f"({tflop / t_pal * 1e3:5.1f} TF/s) "
                    f"x{t_xla / t_pal:4.2f}  max|d|={err:.3e}")
        else:
            row += "  pallas: INELIGIBLE"
        print(row, flush=True)


if __name__ == "__main__":
    main()
