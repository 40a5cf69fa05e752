"""Benchmark: seconds per 2s 320x512 16-frame DDIM-50 clip (UNet denoising
loop, batched-CFG) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: the axon tunnel's block_until_ready acks dispatch, not
completion, so iterations are chained through a data dependency and the run
ends with a host fetch (see memory: axon-benchmark-quirk).

vs_baseline: the reference publishes no wall-clock numbers (SURVEY.md §6);
the north-star target is "under H100 wall-clock per DDIM-50 sample". We use
60 s/clip as the H100-reference proxy (50 steps x 2 sequential UNet evals on
the 1.4B UNet3D; DynamiCrafter-512 community-reported H100 numbers are
~45-75 s) — vs_baseline = baseline_sec / our_sec (>1 means faster).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SEC_PER_CLIP = 60.0
DDIM_STEPS = 50


def main():
    from open_pandora_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jfn = jax.jit(fn)

    # compile + warm
    y = jfn(*args)
    np.asarray(y[0, 0, 0, 0])

    params, x, t, ctx, z_cond, fs = args
    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        y = jfn(params, x, t, ctx, z_cond, fs)
        x = y  # dependency chain (out channels == latent channels)
    np.asarray(y[0, 0, 0, 0])  # true sync
    per_eval = (time.perf_counter() - start) / iters

    sec_per_clip = per_eval * DDIM_STEPS
    out = {
        "metric": "sec_per_2s_320x512_16f_ddim50_clip",
        "value": round(sec_per_clip, 3),
        "unit": "s/clip",
        "vs_baseline": round(BASELINE_SEC_PER_CLIP / sec_per_clip, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
