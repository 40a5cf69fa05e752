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

# FULL product shape census: every attention level of the UNet at BOTH
# product resolutions with its TRUE head count (openaimodel3d.py:552-607;
# model_channels 320, mult [1,2,4,4], d_head 64 -> hd=ch, heads=ch/64).
# 320x512 -> latent 40x64; 576x1024 -> latent 72x128. Attention at
# ds=1,2,4: tokens = (h/8/ds)*(w/8/ds). The round-3 bench OOMed at the
# hi-res level-1 (2304, 640, 10) shape because the matrix below previously
# pinned non-product head counts — keep this table exhaustive.
PRODUCT_LEVELS = [
    # (n_tokens, hd, heads)
    (2560, 320, 5),    # 320x512  level-0
    (640, 640, 10),    # 320x512  level-1
    (160, 1280, 20),   # 320x512  level-2 (n<512 -> XLA path, by design)
    (9216, 320, 5),    # 576x1024 level-0 (multi-KV-block regime)
    (2304, 640, 10),   # 576x1024 level-1 (the BENCH_r03 OOM shape)
    (576, 1280, 20),   # 576x1024 level-2
]


def test_packed_covers_all_product_spatial_sites():
    # self-attn + text-cross + dual streams at every level of BOTH product
    # resolutions, with the TRUE per-level head counts
    for n, hd, heads in PRODUCT_LEVELS:
        assert packed_attention_eligible(n, (n,), heads, hd) or n < 512, \
            f"self-attn not eligible at {(n, hd, heads)}"
        assert packed_attention_eligible(n, (77,), heads, hd) or n < 512, \
            f"text cross-attn not eligible at {(n, hd, heads)}"
        assert packed_attention_eligible(n, (77, 16), heads, hd) or n < 512, \
            f"dual cross-attn not eligible at {(n, hd, heads)}"


def test_vmem_model_bounds_every_product_shape():
    """The modeled scoped-VMEM score stack of the block the chooser picks
    must fit the budget at EVERY product (N, hd, heads) — the exact
    invariant whose absence caused the round-3 bench crash."""
    from open_pandora_tpu.ops import packed_attention as pa

    for n, hd, heads in PRODUCT_LEVELS:
        if n < 512:
            continue
        np_ = pa._ceil_to(n, pa.LANES)
        for ms in [(n,), (77,), (77, 16)]:
            mps = [pa._ceil_to(m, pa.LANES) for m in ms]
            bq = pa._choose_block_q(np_, heads, mps)
            if bq is None:
                # must be routable to the multi-KV-block kernel instead
                assert len(ms) == 1
                assert pa._choose_multi_blocks(heads, hd) is not None
                continue
            budget = (min(pa._STACK_BUDGET_WHOLE_N, pa._stack_budget(heads))
                      if bq == np_ <= 512 else pa._stack_budget(heads))
            assert pa._score_stack_bytes(heads, bq, mps) <= budget
    # regression pins at the real-chip calibration points (preflight sweep
    # 2026-08-19): low-res level-0 keeps the measured-fastest bq=256...
    assert pa._choose_block_q(2560, 5, [2560]) == 256
    # ...the round-3 OOM shape lands on the largest compiling block (96)...
    assert pa._choose_block_q(2304, 10, [2304]) == 96
    # ...and hi-res level-2 on 192 (256 crashes the real-chip compiler)
    assert pa._choose_block_q(640, 20, [640]) == 192


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
