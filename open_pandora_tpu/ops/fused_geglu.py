"""Fused GEGLU FeedForward: LayerNorm + up-projection + erf-GELU gate +
down-projection + residual add in ONE Pallas kernel.

STATUS: measured NEGATIVE result — NOT wired into the model (kept, with
its parity tests, as the recorded experiment). On v5e the kernel runs
10-20x SLOWER than the XLA lowering at every UNet FF shape (level-0
81920x320: 19.2 ms fused vs 1.6 ms XLA; level-1 20480x640: 11.0 vs 1.4;
middle 20480x1280: 14.5 vs 5.0). The premise — that the (R, 8c) GEGLU
intermediate's HBM round-trip makes the XLA FF slow — was wrong: XLA
runs the FF near roofline (~63% MXU) whenever the activation layout is
sane, and inside the real program the neighboring convs pin such layouts
(tconv+FF chain at the level-0 temporal shape: 2.4 ms; only an ISOLATED
3D (B, t, c) FF hits a pathological 21 ms layout). The kernel's K-chunked
grid refetches the weight chunks per row tile and runs small-K matmuls,
which costs far more than the intermediate traffic it saves.

The real hot-loop bottleneck (same round-3 profile, sync-line analysis in
utils/xplane.py) is ~170 ms/iter of compute-stream stalls on parameter
copies, attacked via input layout/prefetch work in the step runner — not
via FF fusion.

The reference FF this mirrors: attention.py:412-437 (Dense(2*4d) ->
erf-gelu gate -> Dense(d)). Training-safe: custom_vjp whose backward
differentiates the XLA twin (`geglu_ff_xla`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = 2.0 ** 0.5


def _gelu_erf(x):
    """torch F.gelu default (erf form) — matches the reference's GEGLU
    (attention.py:424 F.gelu), NOT the tanh approximation."""
    return 0.5 * x * (1.0 + jax.lax.erf(x / _SQRT2))


def _erf_approx(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7 — far below the
    bf16 output rounding): `erf` has no Pallas TPU lowering, exp does."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf_kernel(x):
    return 0.5 * x * (1.0 + _erf_approx(x / _SQRT2))


def _kernel(x_ref, g_ref, b_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref,
            w2_ref, b2_ref, o_ref, xn_scr, acc_scr,
            *, n_k: int, eps: float):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        xn_scr[...] = xn.astype(xn_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xn = xn_scr[...]
    val = jax.lax.dot(xn, w1v_ref[...], preferred_element_type=jnp.float32)
    gate = jax.lax.dot(xn, w1g_ref[...], preferred_element_type=jnp.float32)
    val = val + b1v_ref[0].astype(jnp.float32)
    gate = gate + b1g_ref[0].astype(jnp.float32)
    gated = (val * _gelu_erf_kernel(gate)).astype(xn.dtype)
    acc_scr[...] += jax.lax.dot(gated, w2_ref[...],
                                preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _epilogue():
        out = (acc_scr[...] + b2_ref[0].astype(jnp.float32)
               + x_ref[...].astype(jnp.float32))
        o_ref[...] = out.astype(o_ref.dtype)


# VMEM model: double-buffered weight chunks (3 matrices), fp32 val/gate
# tiles, fp32 accumulator, normalized tile, double-buffered x/o tiles.
_VMEM_BUDGET = 8 * 2 ** 20


def _vmem_bytes(r: int, c: int, ck: int) -> int:
    return (2 * 3 * c * ck * 2          # w1v/w1g/w2 chunks, double-buffered
            + 2 * r * ck * 4            # val + gate fp32
            + r * c * 4                 # accumulator
            + r * c * 2                 # normalized tile
            + 2 * 2 * r * c * 2)        # x in + o out, double-buffered


def _pick_tiles(c: int, inner: int):
    """Largest (r, ck) with ck | inner, both lane/sublane friendly, under
    the VMEM budget. Known shapes: c=320 -> (256, 640); c=640 ->
    (256, 512); c=1280 -> (128, 256)."""
    for r in (256, 128, 64):
        for ck in (640, 512, 256, 128):
            if inner % ck == 0 and _vmem_bytes(r, c, ck) <= _VMEM_BUDGET:
                return r, ck
    return None


def _forward(x2, g, b, w1, b1, w2, b2, eps):
    R, c = x2.shape
    inner2 = w1.shape[1]
    inner = inner2 // 2
    tiles = _pick_tiles(c, inner)
    assert tiles is not None, "caller must check geglu_ff_eligible"
    r, ck = tiles
    n_k = inner // ck

    Rp = (R + r - 1) // r * r
    xp = jnp.pad(x2, ((0, Rp - R), (0, 0))) if Rp != R else x2
    w1v, w1g = w1[:, :inner], w1[:, inner:]
    b1v, b1g = b1[None, :inner], b1[None, inner:]

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, eps=eps),
        grid=(Rp // r, n_k),
        in_specs=[
            pl.BlockSpec((r, c), lambda ri, ki: (ri, 0)),
            pl.BlockSpec((1, c), lambda ri, ki: (0, 0)),
            pl.BlockSpec((1, c), lambda ri, ki: (0, 0)),
            pl.BlockSpec((c, ck), lambda ri, ki: (0, ki)),
            pl.BlockSpec((c, ck), lambda ri, ki: (0, ki)),
            pl.BlockSpec((1, ck), lambda ri, ki: (0, ki)),
            pl.BlockSpec((1, ck), lambda ri, ki: (0, ki)),
            pl.BlockSpec((ck, c), lambda ri, ki: (ki, 0)),
            pl.BlockSpec((1, c), lambda ri, ki: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r, c), lambda ri, ki: (ri, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, c), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((r, c), x2.dtype),
            pltpu.VMEM((r, c), jnp.float32),
        ],
    )(xp, g[None], b[None], w1v, w1g, b1v, b1g, w2, b2[None])
    return out[:R] if Rp != R else out


def geglu_ff_xla(x2, g, b, w1, b1, w2, b2, eps):
    """Exact XLA twin (also the custom-VJP backward): LN (fp32 stats) +
    GEGLU FF + residual, semantics of BasicTransformerBlock's
    norm3 -> FeedForward -> residual tail."""
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x2.dtype)
    h = xn @ w1 + b1.astype(x2.dtype)
    val, gate = jnp.split(h, 2, axis=-1)
    gated = (val.astype(jnp.float32)
             * _gelu_erf(gate.astype(jnp.float32))).astype(x2.dtype)
    out = gated @ w2 + b2.astype(x2.dtype)
    return x2 + out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_ff(x2, g, b, w1, b1, w2, b2, eps):
    return _forward(x2, g, b, w1, b1, w2, b2, eps)


def _fused_ff_fwd(x2, g, b, w1, b1, w2, b2, eps):
    return (_forward(x2, g, b, w1, b1, w2, b2, eps),
            (x2, g, b, w1, b1, w2, b2))


def _fused_ff_bwd(eps, res, ct):
    x2, g, b, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: geglu_ff_xla(*a, eps), x2, g, b, w1, b1, w2, b2)
    return vjp(ct)


_fused_ff.defvjp(_fused_ff_fwd, _fused_ff_bwd)


def geglu_ff_eligible(c: int, mult: int = 4) -> bool:
    return _pick_tiles(c, c * mult) is not None


def fused_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2,
                   *, eps: float = 1e-5) -> jnp.ndarray:
    """x + FF(LN(x)) over the last axis; leading axes are flattened into
    rows. w1: (c, 2*inner) [value columns first, gate columns second —
    matching jnp.split in FeedForward], w2: (inner, c)."""
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    out = _fused_ff(x2, ln_scale, ln_bias, w1, b1, w2, b2, eps)
    return out.reshape(x.shape)
