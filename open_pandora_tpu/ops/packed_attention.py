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

LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# q-block rows: the v5e flash sweep's winner at M=2560 (ops/flash_attention
# "(256, 2560) 3.9 ms"); whole-N when the padded N is smaller.
_DEFAULT_BLOCK_Q = 256
_MAX_KV_ROWS = 2560  # single-kv-block budget (scores bq x Mp fp32 in VMEM)


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


def _packed_call_multi(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       heads: int, scale: float,
                       block_q: Optional[int]) -> jnp.ndarray:
    b, n, hd = q.shape
    d = hd // heads
    bq = _DEFAULT_BLOCK_Q if block_q is None else block_q
    np_ = _ceil_to(n, bq)
    mp = _ceil_to(k.shape[1], _MULTI_BLOCK_K)
    tq = _pad_rows(q, np_)
    tk, tv = _pad_rows(k, mp), _pad_rows(v, mp)

    q_spec = pl.BlockSpec((1, bq, hd), lambda b_, i, j: (b_, i, 0))
    kv_spec = pl.BlockSpec((1, _MULTI_BLOCK_K, hd),
                           lambda b_, i, j: (b_, j, 0))
    out = pl.pallas_call(
        functools.partial(_kernel_multi, scale=scale, heads=heads, d=d,
                          m_real=k.shape[1], bk=_MULTI_BLOCK_K),
        grid=(b, np_ // bq, mp // _MULTI_BLOCK_K),
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
    if block_q is None:
        import os
        env_bq = os.environ.get("PANDORA_PACKED_BLOCKQ")  # sweep override
        # whole-N only for small q: at bq=640/hd=640 the real-TPU compile
        # overflows the 16 MB scoped-VMEM stack (21.6 MB — the unrolled
        # per-head fp32 score temporaries stay live across the head loop);
        # bq=256 compiles and runs at every product shape (measured
        # 2026-08-18, profile_unet packed_bq256)
        bq = (int(env_bq) if env_bq
              else np_ if np_ <= 512 else _DEFAULT_BLOCK_Q)
        bq = min(bq, np_)
    else:
        bq = min(block_q, np_)
    np_ = _ceil_to(np_, bq)
    tq = _pad_rows(q, np_)

    m_reals, gated, ops, in_specs = [], [], [], []
    for k, v, g in streams:
        mp = _ceil_to(k.shape[1], LANES)
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


def packed_attention_eligible(n: int, ms: Sequence[int], heads: int,
                              hd: int) -> bool:
    """Packed-regime gate. Multi-stream (dual) requires every stream's
    padded KV to fit one VMEM block; single-stream also admits the
    multi-KV-block online-softmax kernel (hi-res 9216-token self-attn).
    q must be long enough that a kernel beats XLA's fused small-attn, and
    the head dim must pack into 128-lane groups."""
    import os
    if os.environ.get("PANDORA_DISABLE_PACKED"):
        return False
    if heads == 0 or hd % heads:
        return False
    d = hd // heads
    if not (d <= 128 and LANES % d == 0 and n >= 512):
        return False
    cap = _MAX_KV_ROWS_MULTI if len(ms) == 1 else _MAX_KV_ROWS
    return all(_ceil_to(m, LANES) <= cap for m in ms)


# ---- self-attention -------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _self_packed(q, k, v, heads, scale, block_q):
    if _ceil_to(k.shape[1], LANES) > _MAX_KV_ROWS:
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
