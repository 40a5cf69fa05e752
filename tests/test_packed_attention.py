"""Parity tests for the packed-layout attention kernels
(ops/packed_attention.py) in interpreter mode, against the reshaped XLA
composition they replace."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_pandora_tpu.ops.packed_attention as pa
from open_pandora_tpu.ops.attention_xla import mha_xla


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pa.pl.pallas_call
    monkeypatch.setattr(pa.pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _mk(key, b, rows, hd, dtype):
    return jax.random.normal(key, (b, rows, hd), jnp.float32).astype(dtype)


def _ref_heads(x, heads):
    b, rows, hd = x.shape
    return x.reshape(b, rows, heads, hd // heads)


@pytest.mark.parametrize("b,n,m,heads,hd,dtype", [
    (2, 640, 640, 5, 320, jnp.float32),     # level-0-ish self-attn, multiblock q? no: whole-N
    (1, 1280, 1280, 2, 128, jnp.bfloat16),  # multi-q-block (bq 256 after pad)
    (2, 513, 77, 5, 320, jnp.float32),      # text cross-attn, ragged q + kv pad
])
def test_self_packed_parity(b, n, m, heads, hd, dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = _mk(ks[0], b, n, hd, dtype), _mk(ks[1], b, m, hd, dtype), \
        _mk(ks[2], b, m, hd, dtype)
    out = pa.self_attention_packed(q, k, v, heads=heads, block_q=256)
    ref = mha_xla(_ref_heads(q, heads), _ref_heads(k, heads),
                  _ref_heads(v, heads)).reshape(b, n, hd)
    tol = 2e-5 if dtype == jnp.float32 else 4e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


@pytest.mark.parametrize("b,n,mt,mi,heads,hd,gate", [
    (2, 640, 77, 32, 5, 320, 1.37),
    (1, 600, 100, 130, 2, 128, 0.25),       # ragged everything
])
def test_dual_packed_parity(b, n, mt, mi, heads, hd, gate):
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    q = _mk(ks[0], b, n, hd, jnp.float32)
    kt, vt = _mk(ks[1], b, mt, hd, jnp.float32), _mk(ks[2], b, mt, hd, jnp.float32)
    ki, vi = _mk(ks[3], b, mi, hd, jnp.float32), _mk(ks[4], b, mi, hd, jnp.float32)
    g = jnp.asarray(gate, jnp.float32)
    out = pa.dual_cross_attention_packed(q, kt, vt, ki, vi, g, heads=heads)
    rh = lambda x: _ref_heads(x, heads)
    ref = (mha_xla(rh(q), rh(kt), rh(vt))
           + gate * mha_xla(rh(q), rh(ki), rh(vi))).reshape(b, n, hd)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-5)


def test_multi_kv_block_parity(monkeypatch):
    """Online-softmax multi-KV-block regime (hi-res 9216-token self-attn),
    shrunk: force a small KV block so several blocks run."""
    monkeypatch.setattr(pa, "_MULTI_BLOCK_K", 128)
    monkeypatch.setattr(pa, "_MAX_KV_ROWS", 128)  # push M=300 to multi
    b, n, m, heads, hd = 1, 576, 300, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (_mk(ks[0], b, n, hd, jnp.float32),
               _mk(ks[1], b, m, hd, jnp.float32),
               _mk(ks[2], b, m, hd, jnp.float32))
    out = pa.self_attention_packed(q, k, v, heads=heads, block_q=256)
    ref = mha_xla(_ref_heads(q, heads), _ref_heads(k, heads),
                  _ref_heads(v, heads)).reshape(b, n, hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_multi_kv_block_parity_oddheads(monkeypatch):
    """Multi-block with d=64 heads straddling 128-lane groups (hd=320)."""
    monkeypatch.setattr(pa, "_MULTI_BLOCK_K", 128)
    monkeypatch.setattr(pa, "_MAX_KV_ROWS", 128)
    b, n, m, heads, hd = 1, 512, 384, 5, 320
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (_mk(ks[0], b, n, hd, jnp.bfloat16),
               _mk(ks[1], b, m, hd, jnp.bfloat16),
               _mk(ks[2], b, m, hd, jnp.bfloat16))
    out = pa.self_attention_packed(q, k, v, heads=heads, block_q=512)
    ref = mha_xla(_ref_heads(q, heads), _ref_heads(k, heads),
                  _ref_heads(v, heads)).reshape(b, n, hd)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=4e-2)


def test_gradients_match_fallback():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (_mk(ks[0], 1, 512, 128, jnp.float32),
               _mk(ks[1], 1, 256, 128, jnp.float32),
               _mk(ks[2], 1, 256, 128, jnp.float32))

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    packed = functools.partial(pa.self_attention_packed, heads=2)
    ref = functools.partial(pa._self_fallback, heads=2, scale=64 ** -0.5)
    gp = jax.grad(functools.partial(loss, packed), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(functools.partial(loss, ref), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_eligibility():
    assert pa.packed_attention_eligible(2560, (2560,), 5, 320)
    assert pa.packed_attention_eligible(2560, (77, 256), 5, 320)
    assert not pa.packed_attention_eligible(160, (77,), 5, 320)    # short q
    # single-stream big KV -> multi-KV-block regime; dual stays capped
    assert pa.packed_attention_eligible(9216, (9216,), 5, 320)
    assert not pa.packed_attention_eligible(9216, (9216, 256), 5, 320)
    assert not pa.packed_attention_eligible(2560, (2560,), 5, 321)  # hd split
