"""Parity tests for the batch-tiled tiny-sequence attention kernel
(ops/small_attention.py) — interpreter mode on CPU — against the XLA
attention oracle, forward and backward."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_pandora_tpu.ops.small_attention as sa
from open_pandora_tpu.ops.attention_xla import mha_xla


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = sa.pl.pallas_call
    monkeypatch.setattr(sa.pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _rand(key, shape, dtype):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("b,n,m,h,d,dtype", [
    (160, 16, 16, 5, 64, jnp.float32),      # temporal self-attn (level-0-ish)
    (64, 16, 16, 10, 64, jnp.bfloat16),     # level-1 heads, bf16
    (37, 7, 16, 4, 32, jnp.float32),        # ragged batch/N -> lane padding
    (128, 1, 16, 2, 64, jnp.float32),       # single query row
])
def test_forward_parity(b, n, m, h, d, dtype):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(kq, (b, n, h, d), dtype)
    k = _rand(kk, (b, m, h, d), dtype)
    v = _rand(kv, (b, m, h, d), dtype)
    out = sa.small_attention(q, k, v)
    ref = mha_xla(q, k, v)
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_forward_sm_scale():
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand(kq, (96, 16, 2, 64), jnp.float32)
    k = _rand(kk, (96, 16, 2, 64), jnp.float32)
    v = _rand(kv, (96, 16, 2, 64), jnp.float32)
    out = sa.small_attention(q, k, v, sm_scale=0.3)
    ref = mha_xla(q, k, v, sm_scale=0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_backward_parity():
    kq, kk, kv, kt = jax.random.split(jax.random.PRNGKey(2), 4)
    b, n, h, d = 48, 16, 3, 64
    q = _rand(kq, (b, n, h, d), jnp.float32)
    k = _rand(kk, (b, n, h, d), jnp.float32)
    v = _rand(kv, (b, n, h, d), jnp.float32)
    tgt = _rand(kt, (b, n, h, d), jnp.float32)

    def loss(fn, q, k, v):
        return jnp.sum((fn(q, k, v) - tgt) ** 2)

    gq, gk, gv = jax.grad(functools.partial(loss, sa.small_attention),
                          argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(functools.partial(loss, mha_xla),
                          argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=2e-4)


def test_eligibility():
    assert sa.small_attention_eligible(16, 16, 9216 * 5)
    assert not sa.small_attention_eligible(2560, 16, 9216)    # big N
    assert not sa.small_attention_eligible(16, 77, 9216)      # big M
    assert not sa.small_attention_eligible(16, 16, 8)         # tiny batch
