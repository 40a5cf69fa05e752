"""Parity tests (interpreter mode) for the packed small-sequence attention
and the fused temporal block kernel vs the XLA oracle chain."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_pandora_tpu.ops.fused_temporal as ft
import open_pandora_tpu.ops.small_attention as sa
from open_pandora_tpu.ops.attention_xla import mha_xla
from open_pandora_tpu.ops.norms import layer_norm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ft.pl, "pallas_call",
                        functools.partial(ft.pl.pallas_call, interpret=True))
    monkeypatch.setattr(sa.pl, "pallas_call",
                        functools.partial(sa.pl.pallas_call, interpret=True))


@pytest.mark.parametrize("B,t,H,D", [(24, 4, 2, 16), (17, 4, 2, 16)])
def test_small_attention_parity(B, t, H, D):
    # batch-tiled tiny-sequence kernel (API reworked in the round-3
    # batch-tiling change; deeper coverage in test_small_attention.py)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, t, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, t, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, t, H, D))
    out = sa.small_attention(q, k, v)
    ref = mha_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_causal_routes_away_from_small():
    """The tiny-seq kernel is unmasked-only; the dispatcher must send
    causal tiny-seq attention to the XLA path, never to 'small'."""
    import importlib
    disp = importlib.import_module("open_pandora_tpu.ops.attention")
    B, t, H, D = 16, 4, 1, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, t, H, D))
    with pytest.raises(ValueError):
        disp.attention(q, q, q, causal=True, backend="small")
    out = disp.attention(q, q, q, causal=True)  # auto -> xla on this host
    ref = mha_xla(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_temporal_block_parity():
    B, t, c, heads = 20, 4, 32, 2
    dh = c // heads
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (B, t, c))
    ks = jax.random.split(key, 8)
    wq, wk, wv = (jax.random.normal(k, (c, c)) * 0.1 for k in ks[:3])
    wo = jax.random.normal(ks[3], (c, c)) * 0.1
    bo = jax.random.normal(ks[4], (c,)) * 0.1
    g = jax.random.normal(ks[5], (c,)) * 0.2 + 1.0
    b = jax.random.normal(ks[6], (c,)) * 0.1

    out = ft.fused_temporal_self_attention(y, wq, wk, wv, wo, bo, g, b,
                                           heads=heads, group=8)
    xn = layer_norm(y, g, b, eps=1e-5)
    q = (xn @ wq).reshape(B, t, heads, dh)
    k = (xn @ wk).reshape(B, t, heads, dh)
    v = (xn @ wv).reshape(B, t, heads, dh)
    ref = y + (mha_xla(q, k, v).reshape(B, t, heads * dh) @ wo + bo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_fused_selfcheck_realistic_bf16():
    """Round-1 review item 6: the shipped fast path is bf16 — its error vs
    the fp32 reference must stay within 2x the bf16 XLA twin's own error
    at realistic weight scales on the real site shapes (320/5h, 640/10h)."""
    import open_pandora_tpu.ops.fused_temporal as mod
    ok, ratio = mod.fused_selfcheck(t=4, group=8)  # t shrunk for CPU interp
    assert ok, f"fused kernel noisier than {ratio:.2f}x the bf16 twin"


def test_disable_fused_env_gates_module(monkeypatch):
    """PANDORA_DISABLE_FUSED must route the temporal sites through the XLA
    twin (integration check from round-1 review item 6)."""
    from open_pandora_tpu.models import unet3d

    monkeypatch.setenv("PANDORA_DISABLE_FUSED", "1")
    assert not unet3d._fused_available()
    monkeypatch.delenv("PANDORA_DISABLE_FUSED")
    # on this CPU test host the gate is availability-driven; the env var
    # must be the override either way
    import open_pandora_tpu.ops.fused_temporal as ft_mod
    monkeypatch.setenv("PANDORA_DISABLE_FUSED", "1")
    ft_mod._SELFCHECK_DONE = False
    ft_mod.ensure_fused_accuracy()  # no-op, must not crash or unset the var
    import os
    assert os.environ["PANDORA_DISABLE_FUSED"] == "1"


def test_fused_temporal_inner_ne_c():
    """init_attn case: inner (heads*dh) != c."""
    B, t, c, heads, dh = 12, 4, 16, 2, 16
    inner = heads * dh
    key = jax.random.PRNGKey(3)
    y = jax.random.normal(key, (B, t, c))
    ks = jax.random.split(key, 6)
    wq, wk, wv = (jax.random.normal(k, (c, inner)) * 0.1 for k in ks[:3])
    wo = jax.random.normal(ks[3], (inner, c)) * 0.1
    bo = jnp.zeros((c,))
    g = jnp.ones((c,))
    b = jnp.zeros((c,))
    out = ft.fused_temporal_self_attention(y, wq, wk, wv, wo, bo, g, b,
                                           heads=heads, group=4)
    xn = layer_norm(y, g, b, eps=1e-5)
    q = (xn @ wq).reshape(B, t, heads, dh)
    k = (xn @ wk).reshape(B, t, heads, dh)
    v = (xn @ wv).reshape(B, t, heads, dh)
    ref = y + (mha_xla(q, k, v).reshape(B, t, inner) @ wo + bo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
