"""Packed-layout attention: kernels that consume (B, N, H*D) activations
directly, so NOTHING is relayouted around the attention sites.

Motivation (round-3 xplane evidence): every spatial attention site pays
4-6 standalone relayout copies — reshape (b,n,h*d)->(b,n,h,d) materializes
the (8,128)-tiled 4D form, swapaxes to (b,h,n,d) for the flash kernel is a
layout permutation copy, and the output pays the reverse — ~0.47 ms each at
the 320x512 level-0 shape, ~27 ms per CFG-pair UNet eval in total (sync
%copy class). The projections (to_q/to_k/to_v) already produce (B, N, H*D)
in default layout; these kernels take that layout as-is and write the
output back the same way.

Head handling stays lane-aligned everywhere: blocks keep the FULL packed
feature axis; in-kernel, heads are processed per 128-lane group (slices at
128-multiples only) with a per-head lane mask. A masked full-group matmul
contracts 128 lanes where only the head's D are nonzero — on the 128-deep
MXU that costs the same as the D-deep matmul it replaces, so masking is
free and no sub-tile slice or relayout ever happens.

Covers the single-kv-block regime (padded KV <= ~2560 rows per stream):
the 320x512 product shapes (spatial self-attn N=M=2560/640; dual
text+image cross-attn M=77/16t). The multi-block hi-res regime (N=9216)
keeps ops/flash_attention.py. Reference behavior spec: DynamiCrafter
lvdm/modules/attention.py:89-209 (self + dual-stream cross paths).

Forward kernels only; the custom-VJP backward differentiates the
composable fallback (reshape -> attention/mha_xla -> reshape), so
gradients are correct if anything differentiates through an eval path.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_pandora_tpu.ops.attention_xla import mha_xla

from open_pandora_tpu.core import flags

LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# q-block rows: the v5e flash sweep's winner at M=2560 (ops/flash_attention
# "(256, 2560) 3.9 ms"); whole-N when the padded N is smaller.
_DEFAULT_BLOCK_Q = 256
_MAX_KV_ROWS = 2560  # single-kv-block budget (scores bq x Mp fp32 in VMEM)

# ---- scoped-VMEM stack model ----------------------------------------------
#
# Mosaic allocates the per-head fp32 score temporaries (bq x Mp each) on the
# 16 MB scoped-VMEM stack and keeps them live across the fully-unrolled
# head loop, so the stack cost of _kernel is ~ heads * bq * sum(Mp) * 4 B.
# Real-v5e compile-boundary calibration (tools/preflight.py sweeps,
# 2026-08-19; entries are (heads, bq, Mp-padded) -> modeled MB):
#   PASS (5,256,2560)=13.11   FAIL (5,320,2560)=16.38
#   PASS (10,96,2304)=8.85    FAIL (10,128,2304)=11.80 (r3: (10,256,2304)
#                                   =23.59 reported 24.90, scoped-vmem OOM)
#   PASS (20,192,640)=9.83    FAIL (20,256,640)=13.11
# The compile failure boundary is heads-dependent (more 128-lane head
# groups -> more non-score overhead), so the budget is a calibrated table
# of the largest KNOWN-GOOD modeled size per head-count regime, not a
# constant. tools/preflight.py AOT-compiles the full product shape matrix
# on the real chip to enforce this empirically before every bench.
_STACK_BUDGET_WHOLE_N = 8.0 * 2**20  # single-q-block grids pipeline fatter


def _stack_budget(heads: int) -> float:
    return (13.2 if heads <= 8 else 9.9) * 2**20


# finer than power-of-two halving: bq=96/192 are real-chip-validated
# winners inside the budget at the 10/20-head shapes
_BLOCK_Q_CANDIDATES = (256, 192, 128, 96, 64)
_MIN_BLOCK_Q = 64


def _score_stack_bytes(heads: int, bq: int, mps: Sequence[int]) -> int:
    return heads * bq * sum(mps) * 4


def _choose_block_q(np_: int, heads: int, mps_padded: Sequence[int]):
    """Largest q block whose modeled score stack fits the calibrated
    compile budget, or None. Preference order: whole-N (no q grid) for
    small N, then descending from the measured default 256. None -> the
    shape must route to the multi-KV-block kernel or the flash path."""
    if np_ <= 512 and (_score_stack_bytes(heads, np_, mps_padded)
                       <= min(_STACK_BUDGET_WHOLE_N, _stack_budget(heads))):
        return np_
    for bq in _BLOCK_Q_CANDIDATES:
        cand = min(bq, np_)
        if _score_stack_bytes(heads, cand, mps_padded) <= _stack_budget(heads):
            return cand
    return None


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(gate_ref, q_ref, *refs, scale: float, heads: int, d: int,
            m_reals: Tuple[int, ...], gated: Tuple[bool, ...]):
    """refs = (k0, v0, k1, v1, ..., o). One VMEM block per KV stream.

    Per 128-lane group of the packed feature axis, per head in the group:
    mask the head's lanes, full-group-depth QK^T (exact per-head scores,
    zeros contribute nothing), plain softmax, P@V with the same mask so the
    head's output lands in its own lanes; heads of a group sum into the
    group's output slab. Gated streams accumulate via gate_ref."""
    o_ref = refs[-1]
    kv_refs = refs[:-1]
    q = q_ref[0]                               # (bq, hd)
    hd = q.shape[1]
    n_groups = (hd + LANES - 1) // LANES
    for g in range(n_groups):
        lo = g * LANES
        wg = min(LANES, hd - lo)
        qg = q[:, lo:lo + wg]
        og = None
        for i, m_real in enumerate(m_reals):
            kg = kv_refs[2 * i][0][:, lo:lo + wg]      # (mp, wg)
            vg = kv_refs[2 * i + 1][0][:, lo:lo + wg]
            sg = None
            for h in range(heads):
                off = h * d - lo
                if off < 0 or off >= wg:
                    continue
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, wg), 1)
                hm = (lane >= off) & (lane < off + d)
                qm = jnp.where(hm, qg, jnp.zeros((), qg.dtype))
                s = jax.lax.dot_general(
                    qm, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if m_real != kg.shape[0]:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < m_real, s, MASK_VALUE)
                mx = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - mx)
                l = jnp.sum(p, axis=1, keepdims=True)
                vm = jnp.where(hm, vg, jnp.zeros((), vg.dtype))
                acc = jax.lax.dot(p.astype(vm.dtype), vm,
                                  preferred_element_type=jnp.float32)
                acc = acc / jnp.where(l == 0.0, 1.0, l)
                sg = acc if sg is None else sg + acc
            if gated[i]:
                sg = gate_ref[0, 0] * sg
            og = sg if og is None else og + sg
        o_ref[0, :, lo:lo + wg] = og.astype(o_ref.dtype)


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    return x if x.shape[1] == rows else jnp.pad(
        x, ((0, 0), (0, rows - x.shape[1]), (0, 0)))


# -- multi-KV-block regime (hi-res N=M=9216 spatial self-attention) ---------
#
# Same lane-group/masked-matmul framework, flash-style online softmax over
# KV blocks. The per-head running max / normalizer are kept REPLICATED
# across the head's d lanes of an (bq, hd) fp32 scratch slab, so every
# read, broadcast, rescale and write is a full-group aligned vector op —
# no sub-tile slice ever touches the stats.

_MULTI_BLOCK_K = 1024


def _kernel_multi(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale: float, heads: int, d: int, m_real: int, bk: int):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    q = q_ref[0]                               # (bq, hd)
    hd = q.shape[1]
    n_groups = (hd + LANES - 1) // LANES

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, m_ref.dtype)
        l_ref[...] = jnp.zeros(l_ref.shape, l_ref.dtype)

    for g in range(n_groups):
        lo = g * LANES
        wg = min(LANES, hd - lo)
        qg = q[:, lo:lo + wg]
        kg = k_ref[0][:, lo:lo + wg]           # (bk, wg)
        vg = v_ref[0][:, lo:lo + wg]
        acc_g = acc_ref[:, lo:lo + wg]
        m_g = m_ref[:, lo:lo + wg]
        l_g = l_ref[:, lo:lo + wg]
        for h in range(heads):
            off = h * d - lo
            if off < 0 or off >= wg:
                continue
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, wg), 1)
            hm = (lane >= off) & (lane < off + d)
            qm = jnp.where(hm, qg, jnp.zeros((), qg.dtype))
            s = jax.lax.dot_general(
                qm, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < m_real, s, MASK_VALUE)
            # replicated per-head stats: any masked lane holds the value
            m_old = jnp.max(jnp.where(hm, m_g, -jnp.inf), axis=1,
                            keepdims=True)
            l_old = jnp.max(jnp.where(hm, l_g, 0.0), axis=1, keepdims=True)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_old - m_new)
            l_new = corr * l_old + jnp.sum(p, axis=1, keepdims=True)
            vm = jnp.where(hm, vg, jnp.zeros((), vg.dtype))
            pv = jax.lax.dot(p.astype(vm.dtype), vm,
                             preferred_element_type=jnp.float32)
            acc_g = jnp.where(hm, acc_g * corr + pv, acc_g)
            m_g = jnp.where(hm, m_new, m_g)
            l_g = jnp.where(hm, l_new, l_g)
        acc_ref[:, lo:lo + wg] = acc_g
        m_ref[:, lo:lo + wg] = m_g
        l_ref[:, lo:lo + wg] = l_g

    @pl.when(ki == n_k - 1)
    def _out():
        l = l_ref[...]
        o_ref[0] = (acc_ref[...]
                    / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


# real-v5e calibration: (heads=10, bq=256, bk=1024, hd=640) -> modeled
# 12.4 MB compiles (the same 10-head shape FAILS in the single-block
# kernel at 11.8 — the multi kernel's per-body scores are bq x bk, so its
# live set pipelines leaner); (heads=20, bq=128, bk=1024, hd=1280) ->
# 12.4 MB compiles. Budget = largest known-good modeled size + margin.
_MULTI_STACK_BUDGET = 12.5 * 2**20


def _multi_stack_bytes(heads: int, bq: int, bk: int, hd: int) -> int:
    # per-head fp32 score temporaries live across the unrolled head loop
    # + the 3 (bq, hd) fp32 online-softmax scratch slabs
    return heads * bq * bk * 4 + 3 * bq * hd * 4


def _choose_multi_blocks(heads: int, hd: int):
    """(bq, bk) whose modeled stack fits scoped VMEM, or None."""
    for bq in _BLOCK_Q_CANDIDATES:
        bk = _MULTI_BLOCK_K
        while bk >= 512:
            if _multi_stack_bytes(heads, bq, bk, hd) <= _MULTI_STACK_BUDGET:
                return bq, bk
            bk //= 2
    return None


def _packed_call_multi(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       heads: int, scale: float,
                       block_q: Optional[int]) -> jnp.ndarray:
    b, n, hd = q.shape
    d = hd // heads
    chosen = _choose_multi_blocks(heads, hd)
    bq, bk = chosen if chosen else (_MIN_BLOCK_Q, 512)
    if block_q is not None:
        bq = block_q
    np_ = _ceil_to(n, bq)
    mp = _ceil_to(k.shape[1], bk)
    tq = _pad_rows(q, np_)
    tk, tv = _pad_rows(k, mp), _pad_rows(v, mp)

    q_spec = pl.BlockSpec((1, bq, hd), lambda b_, i, j: (b_, i, 0))
    kv_spec = pl.BlockSpec((1, bk, hd), lambda b_, i, j: (b_, j, 0))
    out = pl.pallas_call(
        functools.partial(_kernel_multi, scale=scale, heads=heads, d=d,
                          m_real=k.shape[1], bk=bk),
        grid=(b, np_ // bq, mp // bk),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32),
                        pltpu.VMEM((bq, hd), jnp.float32),
                        pltpu.VMEM((bq, hd), jnp.float32)],
    )(tq, tk, tv)
    return out[:, :n]


def _packed_call(q: jnp.ndarray,
                 streams: Sequence[Tuple[jnp.ndarray, jnp.ndarray, bool]],
                 gate: jnp.ndarray, heads: int, scale: float,
                 block_q: Optional[int]) -> jnp.ndarray:
    """q (B, N, HD); streams [(k, v, gated)] each (B, M_s, HD)."""
    b, n, hd = q.shape
    d = hd // heads
    np_ = _ceil_to(n, LANES)
    mps_padded = [_ceil_to(k.shape[1], LANES) for k, _, _ in streams]
    if block_q is None:
        env_bq = flags.flag("PANDORA_PACKED_BLOCKQ")  # sweep override
        if env_bq:  # bypasses the VMEM model — sweeps only
            bq = min(env_bq, np_)
        else:
            bq = _choose_block_q(np_, heads, mps_padded)
            if bq is None:  # eligibility should have rejected; be safe
                bq = _MIN_BLOCK_Q
    else:
        bq = min(block_q, np_)
    np_ = _ceil_to(np_, bq)
    tq = _pad_rows(q, np_)

    m_reals, gated, ops, in_specs = [], [], [], []
    for (k, v, g), mp in zip(streams, mps_padded):
        m_reals.append(k.shape[1])
        gated.append(g)
        ops += [_pad_rows(k, mp), _pad_rows(v, mp)]
        in_specs += [pl.BlockSpec((1, mp, hd), lambda b_, i: (b_, 0, 0)),
                     pl.BlockSpec((1, mp, hd), lambda b_, i: (b_, 0, 0))]

    q_spec = pl.BlockSpec((1, bq, hd), lambda b_, i: (b_, i, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads=heads, d=d,
                          m_reals=tuple(m_reals), gated=tuple(gated)),
        grid=(b, np_ // bq),
        in_specs=[pl.BlockSpec((1, 1), lambda b_, i: (0, 0)),
                  q_spec] + in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_, hd), q.dtype),
    )(gate.reshape(1, 1).astype(jnp.float32), tq, *ops)
    return out[:, :n]


_MAX_KV_ROWS_MULTI = 16384


def _single_block_fits(n: int, ms: Sequence[int], heads: int) -> bool:
    mps = [_ceil_to(m, LANES) for m in ms]
    return (all(mp <= _MAX_KV_ROWS for mp in mps)
            and _choose_block_q(_ceil_to(n, LANES), heads, mps) is not None)


def packed_attention_eligible(n: int, ms: Sequence[int], heads: int,
                              hd: int) -> bool:
    """Packed-regime gate, VMEM-aware (round-4 fix for the BENCH_r03
    scoped-VMEM OOM). Multi-stream (dual) requires every stream's padded KV
    to fit one VMEM block AND a q block whose modeled score stack fits the
    16 MB scoped-VMEM limit; single-stream also admits the multi-KV-block
    online-softmax kernel (hi-res 9216-token self-attn, and any shape whose
    single-block score stack would overflow — e.g. hi-res level-1
    N=M=2304 @ 10 heads). q must be long enough that a kernel beats XLA's
    fused small-attn, and the head dim must pack into 128-lane groups."""
    if flags.flag("PANDORA_DISABLE_PACKED"):
        return False
    if heads == 0 or hd % heads:
        return False
    d = hd // heads
    if not (d <= 128 and LANES % d == 0 and n >= 512):
        return False
    if _single_block_fits(n, ms, heads):
        return True
    # single-stream shapes can fall through to the multi-KV-block kernel
    return (len(ms) == 1
            and _ceil_to(ms[0], LANES) <= _MAX_KV_ROWS_MULTI
            and _choose_multi_blocks(heads, hd) is not None)


# ---- self-attention -------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _self_packed(q, k, v, heads, scale, block_q):
    force_multi = flags.flag("PANDORA_PACKED_FORCE_MULTI")  # A/B
    if force_multi or not _single_block_fits(q.shape[1], (k.shape[1],),
                                             heads):
        return _packed_call_multi(q, k, v, heads, scale, block_q)
    one = jnp.ones((), jnp.float32)
    return _packed_call(q, [(k, v, False)], one, heads, scale, block_q)


def _self_fallback(q, k, v, heads, scale):
    from open_pandora_tpu.ops.attention import attention
    b, n, hd = q.shape
    d = hd // heads
    r = lambda x: x.reshape(b, x.shape[1], heads, d)
    return attention(r(q), r(k), r(v), sm_scale=scale).reshape(b, n, hd)


def _self_fwd(q, k, v, heads, scale, block_q):
    return _self_packed(q, k, v, heads, scale, block_q), (q, k, v)


def _self_bwd(heads, scale, block_q, res, ct):
    q, k, v = res
    _, vjp = jax.vjp(lambda *a: _self_fallback(*a, heads, scale), q, k, v)
    return vjp(ct)


_self_packed.defvjp(_self_fwd, _self_bwd)


def self_attention_packed(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, heads: int,
    sm_scale: Optional[float] = None, block_q: Optional[int] = None,
) -> jnp.ndarray:
    """Self/cross attention on packed (B, N, H*D) q and (B, M, H*D) k/v
    -> (B, N, H*D), no relayouts. Caller checks packed_attention_eligible."""
    d = q.shape[-1] // heads
    scale = d ** -0.5 if sm_scale is None else sm_scale
    return _self_packed(q, k, v, heads, scale, block_q)


# ---- dual-stream (text + gated image) cross-attention ---------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _dual_packed(q, kt, vt, ki, vi, gate, heads, scale, block_q):
    return _packed_call(q, [(kt, vt, False), (ki, vi, True)],
                        gate, heads, scale, block_q)


def _dual_fallback(q, kt, vt, ki, vi, gate, heads, scale):
    b, n, hd = q.shape
    d = hd // heads
    r = lambda x: x.reshape(b, x.shape[1], heads, d)
    out = mha_xla(r(q), r(kt), r(vt), sm_scale=scale)
    out_ip = mha_xla(r(q), r(ki), r(vi), sm_scale=scale)
    return (out + gate.astype(out.dtype) * out_ip).reshape(b, n, hd)


def _dual_fwd(q, kt, vt, ki, vi, gate, heads, scale, block_q):
    return (_dual_packed(q, kt, vt, ki, vi, gate, heads, scale, block_q),
            (q, kt, vt, ki, vi, gate))


def _dual_bwd(heads, scale, block_q, res, ct):
    q, kt, vt, ki, vi, gate = res
    _, vjp = jax.vjp(lambda *a: _dual_fallback(*a, heads, scale),
                     q, kt, vt, ki, vi, gate)
    return vjp(ct)


_dual_packed.defvjp(_dual_fwd, _dual_bwd)


def dual_cross_attention_packed(
    q: jnp.ndarray, kt: jnp.ndarray, vt: jnp.ndarray,
    ki: jnp.ndarray, vi: jnp.ndarray, gate: jnp.ndarray, *, heads: int,
    sm_scale: Optional[float] = None, block_q: Optional[int] = None,
) -> jnp.ndarray:
    """attn(q, text kv) + gate * attn(q, image kv) on packed (B, *, H*D)
    operands (reference attention.py:89-144's dual stream, one kernel)."""
    d = q.shape[-1] // heads
    scale = d ** -0.5 if sm_scale is None else sm_scale
    return _dual_packed(q, kt, vt, ki, vi, jnp.asarray(gate),
                        heads, scale, block_q)
