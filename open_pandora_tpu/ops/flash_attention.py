"""Pallas TPU flash attention (fwd + bwd), memory-linear in sequence length.

TPU-native replacement for the reference's CUDA fast paths:
  - xformers.ops.memory_efficient_attention for UNet spatial self-attention
    over h*w tokens (DynamiCrafter/lvdm/modules/attention.py:66-67,175-209)
  - flash_attn varlen for LLaMA causal prefill
    (ChatUniVi/train/llama_flash_attn_monkey_patch.py:81-92)

Design (see /opt/skills/guides/boom_attention_tricks.md):
  - grid (B, H, n_q_blocks, n_kv_blocks); kv innermost so VMEM scratch
    (running max / sum / output accumulator, all fp32) persists per q block
  - online softmax; scores tile never materialized in HBM
  - residual for backward is a single lane-replicated LSE (B, H, N, 128)
  - backward = two kernels (dkv: grid over kv blocks with q innermost;
    dq: grid over q blocks with kv innermost), recomputing p from LSE
  - causal mode skips blocks entirely above the diagonal

Layout contract: q (B, H, N, D), k/v (B, H, M, D). N and M are padded to the
block size by the public wrapper; padded kv columns are masked via `kv_len`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _masked_scores(s, *, causal: bool, mask_pad: bool, kv_len: int,
                   q_offset: int, row0, col0):
    """Apply kv-length / causal masking to a scores tile. When the kv axis
    is pad-free (mask_pad False) and non-causal, this is a no-op — eliding
    ~4 VPU ops per score element on the hot spatial-attention shapes."""
    mask = None
    if mask_pad or causal:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
    if mask_pad:
        mask = col < kv_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + row0
        cm = col <= row + q_offset
        mask = cm if mask is None else jnp.logical_and(mask, cm)
    if mask is not None:
        s = s + jnp.where(mask, 0.0, MASK_VALUE)
    return s


def _fwd_kernel_single(
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    *, sm_scale: float, causal: bool, kv_len: int, q_offset: int,
    block_q: int, block_k: int, mask_pad: bool,
):
    """Whole-kv-in-one-block specialization (n_kv_blocks == 1): plain
    softmax, no online-rescale state, no scratch round-trips. This is the
    regime of every UNet spatial self-attention site (kv fits one block)."""
    qi = pl.program_id(2)
    q = q_ref[0, 0]  # (block_q, D)
    k = k_ref[0, 0]  # (block_k, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    s = _masked_scores(s, causal=causal, mask_pad=mask_pad, kv_len=kv_len,
                       q_offset=q_offset, row0=qi * block_q, col0=0)
    m = jnp.max(s, axis=1, keepdims=True)            # (bq, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0]
    acc = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(
        m + jnp.log(jnp.maximum(l, 1e-37)), (block_q, LANES))


def _fwd_kernel(
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale: float, causal: bool, kv_len: int, q_offset: int,
    block_q: int, block_k: int, n_kv_blocks: int, mask_pad: bool,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        # run only if the block intersects the lower triangle:
        # max query row (global, incl. offset) >= first kv col
        should_run = (qi + 1) * block_q - 1 + q_offset >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # (block_q, D)
        k = k_ref[0, 0]  # (block_k, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # (block_q, block_k)

        s = _masked_scores(s, causal=causal, mask_pad=mask_pad,
                           kv_len=kv_len, q_offset=q_offset,
                           row0=qi * block_q, col0=ki * block_k)

        m_prev = m_scr[...]          # (block_q, LANES), lanes replicated
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)              # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)                    # broadcast
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, 0:1])                         # (bq, bk)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]
        acc_scr[...] = acc_scr[...] * alpha[:, 0:1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == n_kv_blocks - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv[:, 0:1]).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[...] + jnp.log(jnp.maximum(l, 1e-37))


def _fwd(q, k, v, sm_scale, causal, kv_len, q_offset, block_q, block_k):
    B, H, Nq, D = q.shape
    M = k.shape[2]
    n_q, n_k = Nq // block_q, M // block_k
    grid = (B, H, n_q, n_k)
    mask_pad = M != kv_len  # padded kv columns present

    if n_k == 1:
        kernel = functools.partial(
            _fwd_kernel_single, sm_scale=sm_scale, causal=causal,
            kv_len=kv_len, q_offset=q_offset, block_q=block_q,
            block_k=block_k, mask_pad=mask_pad,
        )
        scratch = []
    else:
        kernel = functools.partial(
            _fwd_kernel, sm_scale=sm_scale, causal=causal, kv_len=kv_len,
            q_offset=q_offset, block_q=block_q, block_k=block_k,
            n_kv_blocks=n_k, mask_pad=mask_pad,
        )
        scratch = [
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ]
    out_shapes = (
        jax.ShapeDtypeStruct((B, H, Nq, D), q.dtype),
        jax.ShapeDtypeStruct((B, H, Nq, LANES), jnp.float32),
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, qi, ki: (b, h, qi, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=scratch,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, sm_scale: float, causal: bool, kv_len: int, q_offset: int,
    block_q: int, block_k: int, n_q_blocks: int, mask_pad: bool,
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if causal:
        should_run = (qi + 1) * block_q - 1 + q_offset >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]      # (bq, D)
        k = k_ref[0, 0]      # (bk, D)
        v = v_ref[0, 0]
        do = do_ref[0, 0]    # (bq, D)
        lse = lse_ref[0, 0]  # (bq, LANES)
        di = di_ref[0, 0]    # (bq, LANES)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = _masked_scores(s, causal=causal, mask_pad=mask_pad,
                           kv_len=kv_len, q_offset=q_offset,
                           row0=qi * block_q, col0=ki * block_k)

        p = jnp.exp(s - lse[:, 0:1])                        # (bq, bk)
        dv_scr[...] += jax.lax.dot_general(
            p, do.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # p^T @ do -> (bk, D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        ds = p * (dp - di[:, 0:1]) * sm_scale
        dk_scr[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # ds^T @ q -> (bk, D)

    @pl.when(qi == n_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref,
    dq_scr,
    *, sm_scale: float, causal: bool, kv_len: int, q_offset: int,
    block_q: int, block_k: int, n_kv_blocks: int, mask_pad: bool,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    if causal:
        should_run = (qi + 1) * block_q - 1 + q_offset >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        di = di_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = _masked_scores(s, causal=causal, mask_pad=mask_pad,
                           kv_len=kv_len, q_offset=q_offset,
                           row0=qi * block_q, col0=ki * block_k)

        p = jnp.exp(s - lse[:, 0:1])
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di[:, 0:1]) * sm_scale
        dq_scr[...] += jax.lax.dot(
            ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
        )  # (bq, D)

    @pl.when(ki == n_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd(sm_scale, causal, kv_len, q_offset, block_q, block_k, res, g):
    q, k, v, o, lse = res
    do, _ = g
    B, H, Nq, D = q.shape
    M = k.shape[2]
    n_q, n_k = Nq // block_q, M // block_k

    # di = sum(o * do) per row, lane-replicated like lse
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
                 keepdims=True)
    di = jnp.broadcast_to(di, (B, H, Nq, LANES))

    mask_pad = M != kv_len
    qspec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, ki, qi: (b, h, qi, 0))
    kspec = pl.BlockSpec((1, 1, block_k, D), lambda b, h, ki, qi: (b, h, ki, 0))
    lspec = pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, ki, qi: (b, h, qi, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, causal=causal, kv_len=kv_len,
            q_offset=q_offset, block_q=block_q, block_k=block_k, n_q_blocks=n_q,
            mask_pad=mask_pad,
        ),
        grid=(B, H, n_k, n_q),
        in_specs=[qspec, kspec, kspec, qspec, lspec, lspec],
        out_specs=(kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )(q, k, v, do, lse, di)

    qspec2 = pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0))
    kspec2 = pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h, ki, 0))
    lspec2 = pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, qi, ki: (b, h, qi, 0))
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, causal=causal, kv_len=kv_len,
            q_offset=q_offset, block_q=block_q, block_k=block_k, n_kv_blocks=n_k,
            mask_pad=mask_pad,
        ),
        grid=(B, H, n_q, n_k),
        in_specs=[qspec2, kspec2, kspec2, qspec2, lspec2, lspec2],
        out_specs=qspec2,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
    )(q, k, v, do, lse, di)

    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(q, k, v, sm_scale, causal, kv_len, q_offset, block_q, block_k):
    o, _ = _fwd(q, k, v, sm_scale, causal, kv_len, q_offset, block_q, block_k)
    return o


def _flash_fwd(q, k, v, sm_scale, causal, kv_len, q_offset, block_q, block_k):
    o, lse = _fwd(q, k, v, sm_scale, causal, kv_len, q_offset, block_q, block_k)
    return o, (q, k, v, o, lse)


def _flash_bwd(sm_scale, causal, kv_len, q_offset, block_q, block_k, res, do):
    dq, dk, dv = _bwd(sm_scale, causal, kv_len, q_offset, block_q, block_k,
                      res, (do, None))
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# public wrapper
# ---------------------------------------------------------------------------


def _pick_block(n: int, target: int) -> int:
    """Largest multiple of 128 <= target that divides ceil_to(n, 128)
    pad-free; falls back to `target` (wrapper pads + masks)."""
    np_ = _ceil_to(n, LANES)
    best = LANES
    for b in range(LANES, min(target, np_) + 1, LANES):
        if np_ % b == 0:
            best = b
    return best


_VMEM_BUDGET = 10 * 2 ** 20  # leave headroom under the 16 MB scoped limit
# Tighter cap for the single-kv-block kernel: the 10 MB model admits
# (bq=512, bk=2560) whose real working set spills (measured 7.8 ms in-program
# vs 3.9 ms for (256, 2560) at the level-0 spatial shape on v5e — the model
# under-counts fp32 exp intermediates). 4.5 MB keeps every swept winner and
# rejects every swept spiller.
_VMEM_SINGLE_BUDGET = 9 * 2 ** 19


def _fwd_vmem_bytes(bq: int, bk: int, d: int) -> int:
    """Rough VMEM model of the fwd kernel: double-buffered q/k/v/o blocks,
    fp32 scores, fp32 accumulator + lane-replicated stats."""
    return (2 * bq * d * 2 + 2 * 2 * bk * d * 2 + 2 * bq * d * 2
            + bq * bk * 4 + bq * d * 4 + 3 * bq * LANES * 4)


def _fit_blocks(block_q: int, block_k: int, d: int):
    """Shrink blocks (staying lane-multiples) until the kernel fits scoped
    VMEM — the defaults are tuned for D=64 heads; the VAE mid-attention
    runs ONE 512-dim head over 9216 tokens and needs much smaller tiles."""
    def shrink(b):
        return max((b // 2) // LANES * LANES, LANES)

    while (_fwd_vmem_bytes(block_q, block_k, d) > _VMEM_BUDGET
           and block_k > LANES):
        block_k = shrink(block_k)
    while (_fwd_vmem_bytes(block_q, block_k, d) > _VMEM_BUDGET
           and block_q > LANES):
        block_q = shrink(block_q)
    return block_q, block_k


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention over (B, N, H, D) q and (B, M, H, D) k/v.

    Pads N and M up to the block size (padded kv columns are masked out;
    padded q rows are sliced off). Softmax statistics are fp32 regardless of
    input dtype. Differentiable (custom VJP, Pallas backward kernels).

    Default block sizes from a v5e sweep (512/2560 -> 2.1x over XLA at the
    320x512 spatial-attention shape); block_k is picked pad-free when a
    divisor of the kv length exists.
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    scale = sm_scale if sm_scale is not None else D ** -0.5

    if block_q is None and block_k is None:
        # v5e-swept default policy: prefer the single-kv-block kernel (plain
        # softmax, no online-rescale scratch) with the largest pad-free q
        # block that fits _VMEM_SINGLE_BUDGET. Sweep at the product shapes:
        # N=2560 -> (256, 2560) 3.9 ms (vs 4.5 multi, 7.8 for the spilling
        # (512, 2560)); N=640 -> whole-N (640, 640) 0.25 ms.
        np_, mp_ = _ceil_to(N, LANES), _ceil_to(M, LANES)
        if mp_ <= 2560:
            cands = sorted({b for b in (np_ if np_ <= 1024 else 0,
                                        1024, 512, 256, 128)
                            if LANES <= b <= np_ and np_ % b == 0},
                           reverse=True)
            for b in cands:
                if _fwd_vmem_bytes(b, mp_, D) <= _VMEM_SINGLE_BUDGET:
                    block_q, block_k = b, mp_
                    break
        if block_q is None:  # multi-block fallback (long kv, e.g. VAE@9216)
            block_q = _pick_block(N, 512)
            block_k = _pick_block(M, 2560)
    else:
        if block_q is None:
            np_ = _ceil_to(N, LANES)
            block_q = np_ if np_ <= 1024 else _pick_block(N, 512)
        else:
            block_q = min(block_q, _ceil_to(N, LANES))
        block_k = (_pick_block(M, 2560) if block_k is None
                   else min(block_k, _ceil_to(M, LANES)))
    block_q, block_k = _fit_blocks(block_q, block_k, D)
    Np, Mp = _ceil_to(N, block_q), _ceil_to(M, block_k)

    qh = jnp.swapaxes(q, 1, 2)  # (B, H, N, D)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    if Np != N:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, Np - N), (0, 0)))
    if Mp != M:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, Mp - M), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, Mp - M), (0, 0)))

    # causal offset aligns the END of q with the END of kv (suffix semantics,
    # matching ops.attention_xla.mha_xla)
    q_offset = M - N if causal else 0

    o = _flash(qh, kh, vh, float(scale), causal, M, q_offset, block_q, block_k)
    o = jnp.swapaxes(o, 1, 2)
    if Np != N:
        o = o[:, :N]
    return o
