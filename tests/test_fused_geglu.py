"""Parity tests (interpreter mode) for the fused GEGLU FeedForward kernel
(ops/fused_geglu.py) vs its XLA twin — the LN+GEGLU+residual tail of every
BasicTransformerBlock (reference attention.py:412-437)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_pandora_tpu.ops.fused_geglu as fg


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fg.pl, "pallas_call",
                        functools.partial(fg.pl.pallas_call, interpret=True))


def _inputs(c, rows, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    inner = 4 * c
    std = c ** -0.5
    x = (jax.random.normal(ks[0], (rows, c)) * 3.0).astype(dtype)
    g = (1.0 + 0.1 * jax.random.normal(ks[1], (c,))).astype(dtype)
    b = (0.05 * jax.random.normal(ks[2], (c,))).astype(dtype)
    w1 = (jax.random.normal(ks[3], (c, 2 * inner)) * std).astype(dtype)
    b1 = (0.02 * jax.random.normal(ks[4], (2 * inner,))).astype(dtype)
    w2 = (jax.random.normal(ks[5], (inner, c)) * (inner ** -0.5)).astype(dtype)
    b2 = (0.02 * jax.random.normal(ks[6], (c,))).astype(dtype)
    return x, g, b, w1, b1, w2, b2


@pytest.mark.parametrize("c,rows", [
    (320, 256),    # level-0 tile-exact
    (320, 300),    # row padding path
    (640, 256),    # level-1 (ck=512 chunking)
    (1280, 128),   # level-2/middle (r=128, ck=256)
])
def test_fused_geglu_matches_xla(c, rows):
    args = _inputs(c, rows)
    out = fg.fused_geglu_ff(args[0], *args[1:])
    ref = fg.geglu_ff_xla(*args, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_fused_geglu_bf16():
    args = _inputs(320, 256, dtype=jnp.bfloat16)
    out = fg.fused_geglu_ff(args[0], *args[1:])
    assert out.dtype == jnp.bfloat16
    ref = fg.geglu_ff_xla(*[a.astype(jnp.float32) for a in args], eps=1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=8e-2, rtol=8e-2)


def test_fused_geglu_3d_shape():
    args = _inputs(320, 512)
    x3 = args[0].reshape(2, 256, 320)
    out = fg.fused_geglu_ff(x3, *args[1:])
    assert out.shape == x3.shape
    ref = fg.geglu_ff_xla(*args, eps=1e-5).reshape(2, 256, 320)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_fused_geglu_grad_matches_xla():
    args = _inputs(320, 128, seed=3)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    gf = jax.grad(loss(lambda *a: fg._fused_ff(*a, 1e-5)),
                  argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss(lambda *a: fg.geglu_ff_xla(*a, 1e-5)),
                  argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_gelu_is_erf_form():
    """GEGLU must use torch's default erf GELU, not tanh (the reference
    calls F.gelu, attention.py:424)."""
    x = jnp.linspace(-3, 3, 64)
    np.testing.assert_allclose(
        np.asarray(fg._gelu_erf(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)), atol=1e-6)


def test_eligibility():
    assert fg.geglu_ff_eligible(320)
    assert fg.geglu_ff_eligible(640)
    assert fg.geglu_ff_eligible(1280)
    assert fg._pick_tiles(320, 1280) == (256, 640)


def test_block_param_tree_identical(monkeypatch):
    """BasicTransformerBlock's fused-vs-XLA branches (attn twins; the FF
    deliberately stays XLA — see ops/fused_geglu.py docstring) must produce
    identical param trees, so checkpoints load either way."""
    import open_pandora_tpu.models.unet3d as u3

    blk = u3.BasicTransformerBlock(heads=5, dim_head=64, dtype=jnp.bfloat16,
                                   fused_temporal=False)
    x = jnp.zeros((2, 64, 320), jnp.bfloat16)
    v_xla = blk.init(jax.random.PRNGKey(0), x, None, True)

    monkeypatch.setattr(u3, "_fused_available", lambda: True)
    monkeypatch.setattr(fg.pl, "pallas_call",
                        functools.partial(fg.pl.pallas_call, interpret=True))
    import open_pandora_tpu.ops.fused_temporal as ft
    monkeypatch.setattr(ft.pl, "pallas_call",
                        functools.partial(ft.pl.pallas_call, interpret=True))
    v_fused = blk.init(jax.random.PRNGKey(0), x, None, True)

    flat_x = {jax.tree_util.keystr(p): l.shape
              for p, l in jax.tree_util.tree_leaves_with_path(v_xla)}
    flat_f = {jax.tree_util.keystr(p): l.shape
              for p, l in jax.tree_util.tree_leaves_with_path(v_fused)}
    assert flat_x == flat_f
