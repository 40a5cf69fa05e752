"""Parity tests: Pallas flash attention (interpreter mode on CPU) vs the XLA
oracle; norm primitives vs torch semantics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_pandora_tpu.ops.flash_attention as fa
from open_pandora_tpu.ops.attention import attention
from open_pandora_tpu.ops.attention_xla import mha_xla
from open_pandora_tpu.ops.norms import group_norm, layer_norm, rms_norm


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Run Pallas kernels in interpreter mode (no TPU in CI)."""
    orig = fa.pl.pallas_call
    monkeypatch.setattr(fa.pl, "pallas_call", functools.partial(orig, interpret=True))


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float32)


@pytest.mark.parametrize("n,m,causal", [
    (256, 256, False),
    (256, 256, True),
    (384, 256, False),   # q padding (384 = 1.5*256 -> block clamp)
    (300, 300, False),   # both padded
    (260, 260, True),    # padded causal
])
def test_flash_matches_xla(n, m, causal):
    q = _rand(0, 2, n, 3, 64)
    k = _rand(1, 2, m, 3, 64)
    v = _rand(2, 2, m, 3, 64)
    out = fa.flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    ref = mha_xla(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_grads_match_xla():
    q = _rand(0, 1, 256, 2, 64)
    k = _rand(1, 1, 256, 2, 64)
    v = _rand(2, 1, 256, 2, 64)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, block_q=128, block_k=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(mha_xla(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch")


def test_flash_causal_grads():
    q = _rand(3, 1, 256, 1, 64)
    k = _rand(4, 1, 256, 1, 64)
    v = _rand(5, 1, 256, 1, 64)
    gf = jax.grad(lambda q: jnp.sum(
        fa.flash_attention(q, k, v, causal=True, block_q=128, block_k=128)))(q)
    gx = jax.grad(lambda q: jnp.sum(mha_xla(q, k, v, causal=True)))(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-4, rtol=5e-4)


def test_dispatcher_cpu_uses_xla():
    q = _rand(0, 1, 64, 2, 64)
    out = attention(q, q, q)
    ref = mha_xla(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_dispatcher_suffix_causal():
    """Causal with m > n aligns q to the END of kv (decode semantics)."""
    q = _rand(0, 1, 4, 2, 64)
    k = _rand(1, 1, 16, 2, 64)
    v = _rand(2, 1, 16, 2, 64)
    out = attention(q, k, v, causal=True)
    # last q row attends to all 16; first q row to 13
    mask = np.zeros((1, 1, 4, 16), bool)
    for i in range(4):
        mask[..., i, : 13 + i] = True
    ref = mha_xla(q, k, v, mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


# ---------------------------------------------------------------------------
# norms vs torch
# ---------------------------------------------------------------------------


def test_group_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 8, 8, 64).astype(np.float32)
    w = np.random.RandomState(1).randn(64).astype(np.float32)
    b = np.random.RandomState(2).randn(64).astype(np.float32)
    gn = torch.nn.GroupNorm(32, 64, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(w))
        gn.bias.copy_(torch.from_numpy(b))
        # torch is NCHW
        ref = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    out = group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), num_groups=32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(4, 16, 128).astype(np.float32)
    w = np.random.RandomState(1).randn(128).astype(np.float32)
    b = np.random.RandomState(2).randn(128).astype(np.float32)
    ln = torch.nn.LayerNorm(128)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(w))
        ln.bias.copy_(torch.from_numpy(b))
        ref = ln(torch.from_numpy(x)).numpy()
    out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_rms_norm_bf16_semantics():
    # HF LlamaRMSNorm: fp32 variance, cast back BEFORE scale
    x = (np.random.RandomState(0).randn(4, 128) * 3).astype(np.float32)
    w = np.random.RandomState(1).randn(128).astype(np.float32)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)
    out = rms_norm(xb, jnp.asarray(w))
    xf = x.astype(np.float32)
    ref = xf / np.sqrt((xf ** 2).mean(-1, keepdims=True) + 1e-6)
    ref = ref.astype(jnp.bfloat16).astype(np.float32) * w
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), ref, atol=3e-2, rtol=3e-2)


def test_group_norm_silu_fused():
    x = np.random.RandomState(0).randn(2, 4, 4, 32).astype(np.float32)
    w = np.ones(32, np.float32)
    b = np.zeros(32, np.float32)
    fused = group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), silu=True)
    plain = group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    ref = np.asarray(plain) / (1 + np.exp(-np.asarray(plain)))
    np.testing.assert_allclose(np.asarray(fused), ref, atol=1e-6)


@pytest.mark.parametrize("n,m,causal", [
    (256, 256, False),   # single kv block, mask-free fast path
    (640, 640, False),   # whole-N q block (Np <= 1024) + single kv block
    (640, 640, True),    # causal through the single-block kernel
    (300, 300, False),   # padded kv -> mask_pad in the single-block kernel
    (300, 300, True),    # padded + causal
])
def test_flash_single_kv_block_default_blocks(n, m, causal):
    """Default block picking routes these through _fwd_kernel_single
    (plain softmax, no online-rescale scratch); must match XLA exactly."""
    q = _rand(7, 2, n, 3, 64)
    k = _rand(8, 2, m, 3, 64)
    v = _rand(9, 2, m, 3, 64)
    out = fa.flash_attention(q, k, v, causal=causal)
    ref = mha_xla(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_single_block_grads():
    q = _rand(10, 1, 256, 2, 64)
    k = _rand(11, 1, 256, 2, 64)
    v = _rand(12, 1, 256, 2, 64)
    gf = jax.grad(lambda q, k, v: jnp.sum(
        fa.flash_attention(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(
        mha_xla(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")
