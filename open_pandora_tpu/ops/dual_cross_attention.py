"""Fused dual-stream cross-attention: text-KV and image-KV attention for the
same queries in ONE Pallas kernel, combined in-VMEM with the learnable gate.

The reference's dual cross-attention (DynamiCrafter lvdm/modules/
attention.py:89-144) computes, per spatial transformer attn2 site:

    out = Attn(q, K_text, V_text) + (tanh(alpha)+1) * Attn(q, K_img, V_img)

As two separate attention calls that is: two reads of q, two separate score
chains, an HBM round-trip of both outputs, and a gated add — with the text
stream (77 tokens) running on the small-KV XLA path whose fp32 score tensor
joins the loose-fusion tail. Both KV streams are tiny (77 text, 16t image
tokens) and fit one VMEM block each, so a single kernel computes both plain
softmaxes per q block and writes only the combined output (SURVEY §7.1
kernel (b)).

Forward-only by design: the kernel is routed on the deterministic (eval)
path; the training path keeps the composable attention() calls (whose
flash/small backends have true Pallas backwards). A custom-VJP backward
differentiating the XLA twin is still attached so stray gradients are
correct, not silently wrong.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from open_pandora_tpu.ops.attention_xla import mha_xla

from open_pandora_tpu.core import flags

LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(gate_ref, q_ref, kt_ref, vt_ref, ki_ref, vi_ref, o_ref,
            *, scale: float, mt: int, mi: int):
    q = q_ref[0, 0]                       # (bq, D)
    o = None
    for k_ref_, v_ref_, m_real in ((kt_ref, vt_ref, mt), (ki_ref, vi_ref, mi)):
        k = k_ref_[0, 0]                  # (mp, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if m_real != k.shape[0]:          # mask padded kv columns
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < m_real, s, MASK_VALUE)
        mx = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=1, keepdims=True)
        v = v_ref_[0, 0]
        acc = jax.lax.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        acc = acc / jnp.where(l == 0.0, 1.0, l)
        o = acc if o is None else o + gate_ref[0, 0] * acc
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _pad_kv(x: jnp.ndarray) -> jnp.ndarray:
    m = x.shape[2]
    mp = _ceil_to(m, LANES)
    if mp != m:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, mp - m), (0, 0)))
    return x


def _forward(q, kt, vt, ki, vi, gate, scale):
    b, n, h, d = q.shape
    mt, mi = kt.shape[1], ki.shape[1]
    # (B, N, H, D) -> (B, H, N, D)
    tq = jnp.transpose(q, (0, 2, 1, 3))
    tkt = _pad_kv(jnp.transpose(kt, (0, 2, 1, 3)))
    tvt = _pad_kv(jnp.transpose(vt, (0, 2, 1, 3)))
    tki = _pad_kv(jnp.transpose(ki, (0, 2, 1, 3)))
    tvi = _pad_kv(jnp.transpose(vi, (0, 2, 1, 3)))
    bq = min(1024, _ceil_to(n, LANES))
    np_ = _ceil_to(n, bq)
    if np_ != n:
        tq = jnp.pad(tq, ((0, 0), (0, 0), (0, np_ - n), (0, 0)))
    mtp, mip = tkt.shape[2], tki.shape[2]

    q_spec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0))
    kv = lambda mp: pl.BlockSpec((1, 1, mp, d), lambda b_, h_, i: (b_, h_, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, mt=mt, mi=mi),
        grid=(b, h, np_ // bq),
        in_specs=[pl.BlockSpec((1, 1), lambda b_, h_, i: (0, 0)),
                  q_spec, kv(mtp), kv(mtp), kv(mip), kv(mip)],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, np_, d), q.dtype),
    )(gate.reshape(1, 1).astype(jnp.float32), tq, tkt, tvt, tki, tvi)
    return jnp.transpose(out[:, :, :n], (0, 2, 1, 3))


def dual_cross_attention_xla(q, kt, vt, ki, vi, gate, scale=None):
    """XLA twin (and the custom-VJP backward): two attention calls + gated
    add — exactly CrossAttention's composed dual-stream path."""
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    out = mha_xla(q, kt, vt, sm_scale=scale)
    out_ip = mha_xla(q, ki, vi, sm_scale=scale)
    return out + gate.astype(out.dtype) * out_ip


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _dual(q, kt, vt, ki, vi, gate, scale):
    return _forward(q, kt, vt, ki, vi, gate, scale)


def _dual_fwd(q, kt, vt, ki, vi, gate, scale):
    return _forward(q, kt, vt, ki, vi, gate, scale), (q, kt, vt, ki, vi, gate)


def _dual_bwd(scale, res, ct):
    q, kt, vt, ki, vi, gate = res
    _, vjp = jax.vjp(
        lambda *a: dual_cross_attention_xla(*a, scale), q, kt, vt, ki, vi,
        gate)
    return vjp(ct)


_dual.defvjp(_dual_fwd, _dual_bwd)


def dual_cross_attention(
    q: jnp.ndarray,
    kt: jnp.ndarray,
    vt: jnp.ndarray,
    ki: jnp.ndarray,
    vi: jnp.ndarray,
    gate: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """q (B, N, H, D); text kv (B, Mt, H, D); image kv (B, Mi, H, D);
    gate a scalar array. Returns attn_text + gate * attn_img, (B, N, H, D)."""
    d = q.shape[-1]
    scale = d ** -0.5 if sm_scale is None else sm_scale
    return _dual(q, kt, vt, ki, vi, jnp.asarray(gate), scale)


def dual_cross_attention_eligible(n: int, mt: int, mi: int, d: int) -> bool:
    """Both KV streams must fit one padded VMEM block; q must be long enough
    that a kernel beats XLA's fused small-attention (same bar as flash).
    PANDORA_DISABLE_DUALCA provides the per-kernel A/B switch for perf
    sweeps (PANDORA_DISABLE_FUSED kills all fused paths at once)."""
    if flags.flag("PANDORA_DISABLE_DUALCA"):
        return False
    return (n >= 512 and d <= 128
            and _ceil_to(mt, LANES) <= 512 and _ceil_to(mi, LANES) <= 512)
