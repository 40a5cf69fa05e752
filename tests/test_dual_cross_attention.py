"""Parity tests for the fused dual-stream cross-attention kernel
(ops/dual_cross_attention.py) in interpreter mode, against the composed
two-attention XLA twin."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_pandora_tpu.ops.dual_cross_attention as dca


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = dca.pl.pallas_call
    monkeypatch.setattr(dca.pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _inputs(b, n, mt, mi, h, d, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    mk = lambda k, m: jax.random.normal(
        k, (b, m, h, d), jnp.float32).astype(dtype)
    return (mk(ks[0], n), mk(ks[1], mt), mk(ks[2], mt),
            mk(ks[3], mi), mk(ks[4], mi))


@pytest.mark.parametrize("b,n,mt,mi,h,d,dtype,gate", [
    (2, 640, 77, 256, 5, 64, jnp.float32, 1.37),    # level-1 spatial attn2
    (1, 2560, 77, 256, 5, 64, jnp.bfloat16, 1.0),   # level-0, bf16, gate 1
    (2, 513, 100, 130, 2, 64, jnp.float32, 0.25),   # ragged q + both kv pads
])
def test_forward_parity(b, n, mt, mi, h, d, dtype, gate):
    q, kt, vt, ki, vi = _inputs(b, n, mt, mi, h, d, dtype)
    g = jnp.asarray(gate, jnp.float32)
    out = dca.dual_cross_attention(q, kt, vt, ki, vi, g)
    ref = dca.dual_cross_attention_xla(q, kt, vt, ki, vi, g)
    tol = 1e-5 if dtype == jnp.float32 else 4e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_gradients_match_xla_twin():
    q, kt, vt, ki, vi = _inputs(1, 512, 77, 128, 2, 64, jnp.float32, seed=3)
    g = jnp.asarray(0.8, jnp.float32)

    def loss(fn, q, kt, g):
        return jnp.sum(fn(q, kt, vt, ki, vi, g) ** 2)

    gq, gkt, gg = jax.grad(
        functools.partial(loss, dca.dual_cross_attention),
        argnums=(0, 1, 2))(q, kt, g)
    rq, rkt, rg = jax.grad(
        functools.partial(loss, dca.dual_cross_attention_xla),
        argnums=(0, 1, 2))(q, kt, g)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gkt), np.asarray(rkt), atol=1e-3)
    np.testing.assert_allclose(float(gg), float(rg), rtol=1e-4)


def test_eligibility():
    assert dca.dual_cross_attention_eligible(2560, 77, 256, 64)
    assert not dca.dual_cross_attention_eligible(160, 77, 256, 64)   # short q
    assert not dca.dual_cross_attention_eligible(2560, 77, 2048, 64)  # big kv
