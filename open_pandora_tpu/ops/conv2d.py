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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_pandora_tpu.core import flags

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
    if flags.flag("PANDORA_DISABLE_PCONV"):
        return False
    # diagnostic bisection knob: comma-separated "HxWxCxCO" whitelist
    only = flags.flag("PANDORA_PCONV_ONLY")
    if only:
        if f"{h}x{w}x{c}x{co}" not in only.split(","):
            return False
    elif not flags.flag("PANDORA_ENABLE_PCONV"):
        return False
    if c % 8 or co % 8:
        return False
    # tiny spatial levels: M = h*w too small to beat XLA's fused path
    if h * w < 512:
        return False
    if (h, w, c) not in _MOSAIC_DENY and _choose_blocks(h, w, c, co):
        return True
    return _split_point(h, w, c, co) is not None


# ---------------------------------------------------------------------------
# v2: fused direct conv — in-kernel padding + GN/SiLU prologue + residual
# epilogue (the round-4 measured loss modes of v1, PERF.md: the out-of-kernel
# jnp.pad cost a full-activation HBM round-trip per site, and routing away
# from XLA's conv op forfeited its prologue/epilogue fusions).
#
# Design: x arrives UNPADDED and stays in HBM (memory_space=ANY); the kernel
# DMAs each batch row once into the interior of a zero-bordered VMEM scratch
# slab, applies the folded GroupNorm(+emb)+SiLU prologue in place
# (silu(x * a[b] + s[b]) with a/s per-(batch, channel) fp32 computed outside
# from GN statistics — a tiny reduction), runs the nine accumulated MXU dots
# per output strip, and adds conv bias + the ResBlock skip tensor before the
# single output store. HBM traffic per site: read x once, read skip once,
# write out once — the same traffic as XLA's fully-fused conv, with the
# kernel's higher MXU occupancy.
# ---------------------------------------------------------------------------


def _fused_stack_bytes(h: int, w: int, c: int, co_blk: int, hs: int,
                       co: int, residual: bool) -> int:
    """Modeled VMEM for one fused program: persistent padded slab + weights
    (double-buffered when the co grid revisits) + per-strip out/residual
    blocks (pipelined x2) + fp32 accumulator + shifted-slice and prologue
    fp32 temporaries. Lane padding to 128 applied to every C/Co buffer."""
    cp = _ceil_to(c, _LANES)
    cop = _ceil_to(co_blk, _LANES)
    slab = (h + 2) * _ceil_to(w + 9, 8) * cp * 2  # interior at column 8
    wgt = 9 * cp * cop * 2 * 2
    out = hs * w * cop * 2 * 2
    res = hs * w * cop * 2 * 2 if residual else 0
    acc = hs * w * cop * 4
    slice_tmp = 2 * hs * w * cp * 2
    prologue_tmp = hs * w * cp * 4
    return slab + wgt + out + res + acc + slice_tmp + prologue_tmp


_FUSED_BUDGET = 40.0 * 2**20


def _choose_blocks_fused(h: int, w: int, c: int, co: int,
                         residual: bool = True):
    """(co_blk, n_strips) fitting the fused budget, or None. The strip count
    is a grid dimension here (output rows are blocked), so hs only has to
    divide h; co blocks stay lane-exact divisors (or co itself)."""
    co_cands = sorted(
        {d for d in range(_LANES, co + 1, _LANES) if co % d == 0} | {co},
        reverse=True)
    for co_blk in co_cands:
        for n_strips in (1, 2, 4, 8, 16):
            if h % n_strips:
                continue
            if _fused_stack_bytes(h, w, c, co_blk, h // n_strips, co,
                                  residual) <= _FUSED_BUDGET:
                return co_blk, n_strips
    return None


def _fused_split_point(h: int, w: int, c: int, co: int):
    """C-split for slabs whose fused form does not fit whole (the 960-ch
    hi-res decoder concat convs): conv(x[..,:p]) + conv(x[..,p:])."""
    for p in (640, 512, 384, c // 2):
        q = c - p
        if not (0 < p < c) or p % 8 or q % 8:
            continue
        if (_choose_blocks_fused(h, w, p, co)
                and _choose_blocks_fused(h, w, q, co, residual=False)):
            return p
    return None


def conv3x3_fused_eligible(h: int, w: int, c: int, co: int) -> bool:
    """Routing gate for the fused kernel (PANDORA_ENABLE_PCONV2; same
    PANDORA_PCONV_ONLY bisection grammar as v1)."""
    if flags.flag("PANDORA_DISABLE_PCONV"):
        return False
    only = flags.flag("PANDORA_PCONV_ONLY")
    if only:
        if f"{h}x{w}x{c}x{co}" not in only.split(","):
            return False
    elif not flags.flag("PANDORA_ENABLE_PCONV2"):
        return False
    if c % 8 or co % 8 or w % 8:
        return False  # w%8: interior store extents must be sublane-exact
    if h * w < 512:
        return False
    if _choose_blocks_fused(h, w, c, co):
        return True
    return _fused_split_point(h, w, c, co) is not None


# Interior column offset inside the slab. Mosaic requires STORE / DMA-target
# slice offsets in the sublane dim to be tile-aligned (8); offset-1 interior
# writes and the W+1 right-border store were rejected on the real chip
# (2026-08-19: "Failed to prove that a tile index in dimension 1 is divisible
# by the tiling (8)"). Unaligned LOADS lower fine (the v1 kernel's kx-shifted
# taps measured green on-chip), so the interior lives at column 8 and the
# nine taps read at offsets 7/8/9; borders are zero from one full-slab
# (aligned) store, refreshed only when a revisited interior write could have
# dirtied nothing — i.e. once, at the first grid step.
_PADL = 8


def _fused_kernel(*refs, H, W, hs, S, co_blk, C, out_dtype, cdtype,
                  has_prologue, has_residual, dma):
    """refs: [x] w b [a sh] [res] o slab [sem]. Grid (B, S, J)."""
    it = iter(refs)
    x_ref = next(it)
    w_ref = next(it)
    b_ref = next(it)
    a_ref = next(it) if has_prologue else None
    s_ref = next(it) if has_prologue else None
    r_ref = next(it) if has_residual else None
    o_ref = next(it)
    slab = next(it)
    sem = next(it) if dma else None

    i = pl.program_id(0)
    s = pl.program_id(1)
    j = pl.program_id(2)
    Wp = slab.shape[1]

    @pl.when(jnp.logical_and(i == 0, jnp.logical_and(s == 0, j == 0)))
    def _zero_slab():
        # borders stay zero for the whole grid: every later write targets
        # the interior only, and the interior is fully rewritten per row
        slab[...] = jnp.zeros((H + 2, Wp, C), cdtype)

    @pl.when(jnp.logical_and(s == 0, j == 0))
    def _fill_interior():
        if dma:
            cp = pltpu.make_async_copy(
                x_ref.at[i], slab.at[pl.ds(1, H), pl.ds(_PADL, W), :], sem)
            cp.start()
            cp.wait()
        else:  # regular pipelined (1,H,W,C) block: VMEM interior copy
            slab[pl.ds(1, H), pl.ds(_PADL, W), :] = x_ref[0]
        if has_prologue:
            a = a_ref[0, 0].astype(jnp.float32)
            sh = s_ref[0, 0].astype(jnp.float32)
            for st in range(S):
                r0 = 1 + st * hs
                blk = slab[r0:r0 + hs, _PADL:_PADL + W, :].astype(
                    jnp.float32)
                blk = blk * a + sh
                blk = blk * jax.nn.sigmoid(blk)
                slab[r0:r0 + hs, _PADL:_PADL + W, :] = blk.astype(cdtype)

    soff = s * hs
    acc = jnp.zeros((hs * W, co_blk), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xs = slab[pl.ds(soff + ky, hs),
                      pl.ds(_PADL - 1 + kx, W), :].reshape(hs * W, -1)
            acc = acc + jax.lax.dot(xs, w_ref[ky, kx],
                                    preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if has_residual:
        acc = acc + r_ref[0].reshape(hs * W, co_blk).astype(jnp.float32)
    o_ref[0] = acc.reshape(hs, W, co_blk).astype(out_dtype)


def conv3x3_fused(x: jnp.ndarray, w: jnp.ndarray,
                  b: Optional[jnp.ndarray] = None,
                  scale: Optional[jnp.ndarray] = None,
                  shift: Optional[jnp.ndarray] = None,
                  residual: Optional[jnp.ndarray] = None,
                  dma: Optional[bool] = None) -> jnp.ndarray:
    """Fused ResBlock conv: out = conv3x3(silu(x*scale+shift)) + bias
    + residual, stride 1, same padding, fp32 accumulation.

    x (B,H,W,C) UNPADDED; scale/shift (B,C) fp32 — the GroupNorm(+emb) fold
    (normalized = x*(gamma/sigma) + ((e-mu)*gamma/sigma + beta)); residual
    (B,H,W,Co) — the ResBlock skip. scale=None skips the prologue entirely
    (plain in-kernel-padded conv). `dma` selects the slab fill: the manual
    HBM->VMEM async copy is only legal when the lane dim is tile-exact
    (Mosaic rejects memref slices whose last dim isn't 128-aligned against
    the padded HBM tiling — the UNet's C=8 input conv and the C=320 L0
    slabs, real-chip 2026-08-19), so dma=None auto-selects it for
    C % 128 == 0 and falls back to a regular pipelined input block + a
    VMEM->VMEM interior copy elsewhere (no extra HBM traffic either way:
    the block index only changes with the batch grid dim, so the pipeline
    fetches x once per row)."""
    B, H, W, C = x.shape
    assert w.shape[:3] == (3, 3, C), w.shape
    Co = w.shape[-1]
    has_prologue = scale is not None
    chosen = _choose_blocks_fused(H, W, C, Co, residual is not None)
    if chosen is None:
        p = _fused_split_point(H, W, C, Co)
        assert p is not None, (
            f"conv3x3_fused: slab {(H, W, C)} routes neither whole nor "
            "split; route via conv3x3_fused_eligible")
        return (conv3x3_fused(x[..., :p], w[:, :, :p], b,
                              None if scale is None else scale[:, :p],
                              None if shift is None else shift[:, :p],
                              residual, dma=dma)
                + conv3x3_fused(x[..., p:], w[:, :, p:], None,
                                None if scale is None else scale[:, p:],
                                None if shift is None else shift[:, p:],
                                None, dma=dma))
    if dma is None:  # resolved per leaf call: the C-split parts differ in C
        dma = C % _LANES == 0
    co_blk, S = chosen
    hs = H // S

    wb = w.astype(x.dtype)
    bias = (b if b is not None else jnp.zeros((Co,), jnp.float32))
    bias2d = bias.reshape(1, Co).astype(jnp.float32)

    kernel = functools.partial(
        _fused_kernel, H=H, W=W, hs=hs, S=S, co_blk=co_blk, C=C,
        out_dtype=x.dtype, cdtype=x.dtype, has_prologue=has_prologue,
        has_residual=residual is not None, dma=dma)

    if dma:
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        x_spec = pl.BlockSpec((1, H, W, C), lambda i, s, j: (i, 0, 0, 0))
    in_specs = [
        x_spec,
        pl.BlockSpec((3, 3, C, co_blk), lambda i, s, j: (0, 0, 0, j)),
        pl.BlockSpec((1, co_blk), lambda i, s, j: (0, j)),
    ]
    args = [x, wb, bias2d]
    if has_prologue:
        assert scale.shape == (B, C) and shift.shape == (B, C)
        # (B, 1, C) with block (1, 1, C): Mosaic requires the block's
        # second-to-last dim to divide by 8 or equal the array's — (1, C)
        # against array dims (1, C) satisfies it; a (1, C) block over a
        # (B, C) array does not (B=32 batch rows; caught on real-chip
        # lowering 2026-08-19, invisible to interpret-mode tests).
        in_specs += [pl.BlockSpec((1, 1, C), lambda i, s, j: (i, 0, 0)),
                     pl.BlockSpec((1, 1, C), lambda i, s, j: (i, 0, 0))]
        args += [scale.astype(jnp.float32)[:, None],
                 shift.astype(jnp.float32)[:, None]]
    if residual is not None:
        assert residual.shape == (B, H, W, Co), residual.shape
        in_specs.append(
            pl.BlockSpec((1, hs, W, co_blk), lambda i, s, j: (i, s, 0, j)))
        args.append(residual.astype(x.dtype))

    scratch = [pltpu.VMEM((H + 2, _PADL + W + 1, C), x.dtype)]
    if dma:
        scratch.append(pltpu.SemaphoreType.DMA)
    return pl.pallas_call(
        kernel,
        grid=(B, S, Co // co_blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hs, W, co_blk),
                               lambda i, s, j: (i, s, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*args)


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


# ---------------------------------------------------------------------------
# XLA-level shifted-dot formulation (round 5)
# ---------------------------------------------------------------------------


def conv3x3_ninedot(x: jnp.ndarray, w: jnp.ndarray,
                    b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stride-1 same-pad 3x3 NHWC conv as NINE shifted full-stream matmuls
    — the spatial twin of models/unet3d._TConv3's measured temporal win.

    Rationale: XLA:TPU's conv emitter runs the level-0 (c=320) slabs at
    42-67 TF/s (PERF.md round-4 tables) — tiling slack at small spatial
    dims, not lane waste. Reformulated as dots, each tap is a
    (N*H*W, C) @ (C, Co) GEMM with long-M tiling that the MXU pipeline
    handles at its best, and XLA fuses the +adds into dot epilogues. The
    pad is materialized ONCE; each tap reads a shifted window of it.
    Fully differentiable (pure XLA ops) — usable in training paths, unlike
    the Pallas kernels above. Routing: models/unet3d._SConv3x3 under
    PANDORA_SPATIAL_DOT (measured A/B gate).
    """
    Hh, Ww = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wb = w.astype(x.dtype)
    y = None
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy:dy + Hh, dx:dx + Ww, :] @ wb[dy, dx]
            y = tap if y is None else y + tap
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
