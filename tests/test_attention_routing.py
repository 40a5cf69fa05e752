"""Fast-path routing matrix for CrossAttention: which kernel each
(dtype, platform, shape, env) combination selects. Pure-logic checks (the
kernels themselves are parity-tested elsewhere) — pins the dispatch so a
refactor can't silently drop a fast path or route fp32 through bf16-only
kernels."""

import jax.numpy as jnp
import pytest

import open_pandora_tpu.models.unet3d as unet3d
from open_pandora_tpu.ops.dual_cross_attention import (
    dual_cross_attention_eligible)
from open_pandora_tpu.ops.packed_attention import packed_attention_eligible


PROD_L0 = dict(n=2560, m=77, mi=16, heads=5, hd=320, d=64)   # 320x512 level-0
PROD_HI = dict(n=9216, m=77, mi=16, heads=5, hd=320, d=64)   # 576x1024 level-0


def test_packed_covers_all_product_spatial_sites():
    # self-attn + text-cross + dual streams at every 320x512/576x1024 level
    for n in (2560, 9216, 640, 2304, 576):
        assert packed_attention_eligible(n, (n,), 5, 320) or n < 512
        assert packed_attention_eligible(n, (77,), 5, 320) or n < 512
        if n <= 2560:
            assert packed_attention_eligible(n, (77, 16), 5, 320) or n < 512
    # level-1/2 head counts
    assert packed_attention_eligible(640, (640,), 10, 640)
    assert packed_attention_eligible(576, (576,), 20, 1280)


def test_dual_headsplit_fallback_matches_packed_domain():
    # the head-split dual kernel remains a usable secondary at the
    # single-block shapes (A/B baseline for the packed kernel)
    assert dual_cross_attention_eligible(PROD_L0["n"], 77, 16, 64)
    assert not dual_cross_attention_eligible(160, 77, 16, 64)


def test_env_gates(monkeypatch):
    monkeypatch.setenv("PANDORA_DISABLE_PACKED", "1")
    assert not packed_attention_eligible(2560, (2560,), 5, 320)
    monkeypatch.delenv("PANDORA_DISABLE_PACKED")
    monkeypatch.setenv("PANDORA_DISABLE_DUALCA", "1")
    assert not dual_cross_attention_eligible(2560, 77, 16, 64)


def test_fp32_and_training_never_route_fast(monkeypatch):
    """The golden fp32 mode and the training path must take the composable
    attention() calls: CrossAttention gates on bf16 + deterministic before
    any eligibility check."""
    import jax

    calls = []
    monkeypatch.setattr(unet3d, "_fused_available", lambda: True)
    monkeypatch.setattr(
        unet3d, "self_attention_packed",
        lambda q, k, v, **kw: calls.append("packed") or jnp.zeros_like(q))

    # fp32 input -> the packed stub must never fire during init/apply
    m = unet3d.CrossAttention(heads=2, dim_head=32, dtype=jnp.float32)
    x = jnp.zeros((1, 640, 64), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, None, True)
    m.apply(params, x, None, True)
    assert calls == []

    # bf16 + deterministic=True routes the stub (sanity that the monkey-
    # patched probe actually observes the fast path)...
    mb = unet3d.CrossAttention(heads=2, dim_head=32, dtype=jnp.bfloat16)
    xb = jnp.zeros((1, 640, 64), jnp.bfloat16)
    pb = mb.init(jax.random.PRNGKey(0), xb, None, True)
    assert calls == ["packed"]  # the init trace routed the fast path
    calls.clear()
    # ...but deterministic=False (training) must not
    mb.apply(pb, xb, None, False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert calls == []
