"""Pallas direct 3x3 NHWC convolution (same padding, stride 1).

Why: the UNet eval is conv-bound after round 3 (~115 of 261 ms at
320x512; PERF.md) and XLA:TPU's convolution emitter runs the product's
3x3 ResBlock convs at ~50-65% MXU. This kernel reformulates the conv as
nine accumulated MXU matmuls over in-VMEM shifted views of the padded
input slab — the whole (H+2, W+2, C) image fits VMEM at every product
level, so the input is read from HBM exactly once and the only MXU
inefficiency left is lane padding when C is not a multiple of 128
(320 -> 83%; 640/1280 are exact).

Reference scope: the ResBlock in/out convs of openaimodel3d.py:112-240
(spatial 3x3, stride 1, same padding). Stride-2 Downsample and the 1x1
skip projections stay on XLA (1x1 lowers to a plain matmul already).

Shapes are routed through `conv3x3_eligible` + a VMEM model with a
real-chip-calibrated budget (the round-3 lesson: model the scoped-VMEM
stack, never assume "lowers clean" means "compiles").
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The kernel's scoped-VMEM limit is raised from the 16 MB default via
# CompilerParams: v5e has 128 MB of VMEM, this kernel reads its input
# exactly once (no prefetch overlap to preserve), and the 16 MB default
# demonstrably cannot hold the real Mosaic stack of the product slabs
# in-program (measured 17.11M at (40,64,320->320): lane padding 320->384
# on every C-dim buffer plus input-slab double-buffering across the batch
# grid inflate the stack ~1.5x over the naive model below). The model
# budget keeps >=1.6x margin under the raised limit.
_VMEM_LIMIT = int(64 * 2**20)
_STACK_BUDGET = 32.0 * 2**20
_LANES = 128

# populated by _SConv3x3 when PANDORA_CONV_CENSUS is set (preflight
# traces the UNet to enumerate every conv site instead of a
# hand-maintained list that can miss shapes)
CENSUS: set = set()

# Compile-failure denylist: (h, w, c) slabs that fail the real-chip AOT
# compile despite fitting the model route through the C-split path below
# (or to XLA when no split is viable). EMPTY since the scoped-VMEM limit
# was raised: under the 16 MB default, (36,64,960), (40,64,960) and
# (72,128,8) died in the compile helper (exit 1, no diagnostic) at every
# block config — all compile green at 64 MB. Kept as the calibrated
# escape hatch for future preflight failures at new product shapes.
_MOSAIC_DENY: set = set()


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _stack_bytes(h: int, w: int, c: int, co_blk: int, hs: int,
                 co: int) -> int:
    """Modeled VMEM stack for one program: input slab + double-buffered
    shifted-slice temp + fp32 accumulator + weights (double-buffered when
    the co grid dimension revisits them) + output block."""
    x_slab = (h + 2) * (w + 2) * c * 2
    slice_tmp = 2 * hs * w * c * 2          # x2: pipelining headroom
    acc = hs * w * co_blk * 4
    wgt = 9 * c * co_blk * 2 * (2 if co // co_blk > 1 else 1)
    out = h * w * co_blk * 2
    return x_slab + slice_tmp + acc + wgt + out


def _choose_blocks(h: int, w: int, c: int, co: int):
    """(co_blk, n_strips) fitting the budget, or None. co blocks are
    lane-exact divisors of co (multiples of 128) — or co itself, whose
    final partial lane-tile the MXU pads anyway; anything else re-pads
    every dot's N dimension."""
    co_cands = sorted(
        {d for d in range(_LANES, co + 1, _LANES) if co % d == 0} | {co},
        reverse=True)
    for co_blk in co_cands:
        for n_strips in (1, 2, 4, 8):
            if h % n_strips:
                continue
            if _stack_bytes(h, w, c, co_blk, h // n_strips,
                            co) <= _STACK_BUDGET:
                return co_blk, n_strips
    return None


def _split_point(h: int, w: int, c: int, co: int):
    """For slabs that cannot route whole (denylisted, or no block config
    fits the budget): a C-split point p so conv(x[..,:p]) + conv(x[..,p:])
    replaces the whole conv, with both parts individually compiling.
    Prefers the 640+320 split (the decoder concat convs are skip 320 +
    body 640; both halves measured green at every product shape)."""
    for p in (640, 512, 384, c // 2):
        q = c - p
        if not (0 < p < c) or p % 8 or q % 8:
            continue
        if (h, w, p) in _MOSAIC_DENY or (h, w, q) in _MOSAIC_DENY:
            continue
        if _choose_blocks(h, w, p, co) and _choose_blocks(h, w, q, co):
            return p
    return None


def conv3x3_eligible(h: int, w: int, c: int, co: int) -> bool:
    """OPT-IN (round-4 measured negative result, PERF.md): in-program the
    direct kernel LOSES to XLA's conv emitter at both product resolutions
    — 320x512 CFG-pair eval 290.4 ms routed vs 271.6 XLA (L0-only routing
    289.4: the loss is concentrated in the biggest slabs, where the
    out-of-kernel pad round-trip + losing XLA's conv prologue/epilogue
    fusions cost more than the per-site MXU win of the nine-dot kernel,
    4.15 ms Pallas vs ~5-6 XLA at 20x32 c1280). Route via
    PANDORA_ENABLE_PCONV=1 or the PANDORA_PCONV_ONLY whitelist; the
    preflight keeps compiling every product shape so the kernel stays a
    live base for an in-kernel-pad + fused-epilogue round-5 iteration."""
    if os.environ.get("PANDORA_DISABLE_PCONV"):
        return False
    # diagnostic bisection knob: comma-separated "HxWxCxCO" whitelist
    only = os.environ.get("PANDORA_PCONV_ONLY")
    if only:
        if f"{h}x{w}x{c}x{co}" not in only.split(","):
            return False
    elif not os.environ.get("PANDORA_ENABLE_PCONV"):
        return False
    if c % 8 or co % 8:
        return False
    # tiny spatial levels: M = h*w too small to beat XLA's fused path
    if h * w < 512:
        return False
    if (h, w, c) not in _MOSAIC_DENY and _choose_blocks(h, w, c, co):
        return True
    return _split_point(h, w, c, co) is not None


def _kernel(x_ref, w_ref, b_ref, o_ref, *, H, W, co_blk, n_strips, out_dtype):
    hs = H // n_strips
    for s in range(n_strips):
        acc = jnp.zeros((hs * W, co_blk), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                xs = x_ref[0, s * hs + ky: s * hs + ky + hs,
                           kx: kx + W, :].reshape(hs * W, -1)
                acc = acc + jax.lax.dot(
                    xs, w_ref[ky, kx],
                    preferred_element_type=jnp.float32)
        acc = acc + b_ref[0].astype(jnp.float32)
        o_ref[0, s * hs:(s + 1) * hs] = acc.reshape(
            hs, W, co_blk).astype(out_dtype)


def conv3x3_nhwc(x: jnp.ndarray, w: jnp.ndarray,
                 b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x (B, H, W, C) x w (3, 3, C, Co) [+ bias (Co,)] -> (B, H, W, Co),
    stride 1, same padding, fp32 accumulation, output in x.dtype."""
    B, H, W, C = x.shape
    assert w.shape[:3] == (3, 3, C), w.shape
    Co = w.shape[-1]
    if (H, W, C) in _MOSAIC_DENY or _choose_blocks(H, W, C, Co) is None:
        p = _split_point(H, W, C, Co)
        assert p is not None, (
            f"conv3x3_nhwc: slab {(H, W, C)} routes neither whole nor "
            "split; route via conv3x3_eligible")
        return (conv3x3_nhwc(x[..., :p], w[:, :, :p], b)
                + conv3x3_nhwc(x[..., p:], w[:, :, p:], None))
    chosen = _choose_blocks(H, W, C, Co)
    assert chosen is not None, (
        f"conv3x3_nhwc: no block fits VMEM for {(H, W, C, Co)}; "
        "route via conv3x3_eligible")
    co_blk, n_strips = chosen

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wb = w.astype(x.dtype)
    bias = (b if b is not None else jnp.zeros((Co,), jnp.float32))
    bias2d = bias.reshape(1, Co).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, H=H, W=W, co_blk=co_blk, n_strips=n_strips,
        out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, Co // co_blk),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, co_blk), lambda i, j: (0, 0, 0, j)),
            pl.BlockSpec((1, co_blk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, H, W, co_blk), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, wb, bias2d)
