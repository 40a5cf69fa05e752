"""Pallas direct 3x3 conv vs lax.conv_general_dilated (XLA reference)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_pandora_tpu.ops.conv2d as c2


@pytest.fixture
def _interpret_pallas(monkeypatch):
    orig = c2.pl.pallas_call
    monkeypatch.setattr(c2.pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@pytest.mark.parametrize("shape", [
    # (B, H, W, C, Co): product-level analogs scaled to test size
    (2, 8, 16, 32, 32),     # single strip, co_blk = co
    (1, 8, 16, 32, 64),
    (2, 16, 8, 64, 32),
])
def test_conv3x3_matches_xla(_interpret_pallas, shape):
    B, H, W, C, Co = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (Co,), jnp.float32)
    out = c2.conv3x3_nhwc(x, w, b)
    ref = _xla_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_strips(_interpret_pallas, monkeypatch):
    """Force multi-strip execution (the hi-res VMEM regime) and check
    edge rows across strip boundaries."""
    monkeypatch.setattr(c2, "_STACK_BUDGET", 24 * 2**10)
    B, H, W, C, Co = 1, 16, 8, 16, 16
    blk = c2._choose_blocks(H, W, C, Co)
    assert blk is not None and blk[1] > 1, blk
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.1
    out = c2.conv3x3_nhwc(x, w)
    ref = _xla_conv(x, w, jnp.zeros((Co,)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_bf16(_interpret_pallas):
    B, H, W, C, Co = 1, 8, 16, 32, 32
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.1
    out = c2.conv3x3_nhwc(x, w)
    assert out.dtype == jnp.bfloat16
    ref = _xla_conv(x, w, jnp.zeros((Co,)))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=0.15, rtol=0.1)


def test_eligibility_and_blocks(monkeypatch):
    monkeypatch.setenv("PANDORA_ENABLE_PCONV", "1")
    # product shapes at 320x512 (B*T folded out of the model):
    # L0 self 40x64 c320->320 must fit; L1 20x32 c640->640 must fit
    assert c2.conv3x3_eligible(40, 64, 320, 320)
    assert c2.conv3x3_eligible(20, 32, 640, 640)
    # decoder concat conv at L0 (c = 640 -> 320)
    assert c2.conv3x3_eligible(40, 64, 640, 320)
    # tiny levels route to XLA
    assert not c2.conv3x3_eligible(10, 16, 1280, 1280)
    # every eligible product shape's chosen blocks satisfy the VMEM model
    for (h, w, c, co) in [(40, 64, 320, 320), (20, 32, 640, 640),
                          (40, 64, 640, 320), (36, 64, 640, 640),
                          (72, 128, 320, 320), (72, 128, 640, 320)]:
        blk = c2._choose_blocks(h, w, c, co)
        if blk is None:
            continue
        co_blk, n_strips = blk
        assert co % co_blk == 0 and h % n_strips == 0
        assert c2._stack_bytes(h, w, c, co_blk, h // n_strips,
                               co) <= c2._STACK_BUDGET


def test_split_path_matches_xla(_interpret_pallas, monkeypatch):
    """Denylisted slabs route through the C-split (two kernels, summed)."""
    B, H, W, C, Co = 1, 16, 32, 48, 32
    monkeypatch.setenv("PANDORA_ENABLE_PCONV", "1")
    monkeypatch.setattr(c2, "_MOSAIC_DENY", {(H, W, C)})
    assert c2.conv3x3_eligible(H, W, C, Co)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (Co,), jnp.float32)
    out = c2.conv3x3_nhwc(x, w, b)
    ref = _xla_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_product_shapes_eligible_whole(monkeypatch):
    monkeypatch.setenv("PANDORA_ENABLE_PCONV", "1")
    # under the raised 64M scoped-VMEM limit every product conv slab
    # (both resolutions) routes whole — incl. the decoder concat convs
    # and the 576x1024 L0 slabs that OOMed the 16M default (2026-08-19)
    assert c2._MOSAIC_DENY == set()
    for (h, w, c, co) in [(36, 64, 960, 640), (40, 64, 960, 320),
                          (72, 128, 8, 320), (72, 128, 320, 320),
                          (72, 128, 960, 320)]:
        assert c2.conv3x3_eligible(h, w, c, co), (h, w, c, co)
    # the hi-res L0 decoder concat is too big whole at any block config:
    # it routes via the generalized C-split fallback
    assert c2._choose_blocks(72, 128, 960, 320) is None
    assert c2._split_point(72, 128, 960, 320) == 640


def test_env_gate(monkeypatch):
    # default (no env): routing is opt-in after the round-4 in-program
    # negative result — XLA convs win the full eval at both resolutions
    assert not c2.conv3x3_eligible(40, 64, 320, 320)
    monkeypatch.setenv("PANDORA_ENABLE_PCONV", "1")
    assert c2.conv3x3_eligible(40, 64, 320, 320)
    monkeypatch.setenv("PANDORA_DISABLE_PCONV", "1")
    assert not c2.conv3x3_eligible(40, 64, 320, 320)
    monkeypatch.delenv("PANDORA_DISABLE_PCONV")
    monkeypatch.delenv("PANDORA_ENABLE_PCONV")
    monkeypatch.setenv("PANDORA_PCONV_ONLY", "40x64x320x320")
    assert c2.conv3x3_eligible(40, 64, 320, 320)
    assert not c2.conv3x3_eligible(20, 32, 640, 640)


# ---------------------------------------------------------------------------
# v2 fused kernel: in-kernel pad + GN/SiLU prologue + bias/residual epilogue
# ---------------------------------------------------------------------------


def _xla_fused_ref(x, w, b, a, s, res):
    """silu(x*a+s) -> conv -> +bias (+res), all fp32."""
    xf = x.astype(jnp.float32)
    if a is not None:
        xf = xf * a[:, None, None, :] + s[:, None, None, :]
        xf = xf * jax.nn.sigmoid(xf)
    y = jax.lax.conv_general_dilated(
        xf, w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    return y if res is None else y + res.astype(jnp.float32)


@pytest.mark.parametrize("dma", [False, True])
@pytest.mark.parametrize("with_pro,with_res", [
    (False, False), (True, False), (True, True), (False, True)])
def test_conv3x3_fused_matches_xla(_interpret_pallas, dma, with_pro,
                                   with_res):
    B, H, W, C, Co = 2, 8, 16, 32, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (Co,), jnp.float32)
    a = (jax.random.normal(ks[3], (B, C), jnp.float32) * 0.3 + 1.0
         if with_pro else None)
    s = (jax.random.normal(ks[4], (B, C), jnp.float32) * 0.2
         if with_pro else None)
    res = (jax.random.normal(ks[5], (B, H, W, Co), jnp.float32)
           if with_res else None)
    out = c2.conv3x3_fused(x, w, b, scale=a, shift=s, residual=res, dma=dma)
    ref = _xla_fused_ref(x, w, b, a, s, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_fused_strips_and_coblocks(_interpret_pallas, monkeypatch):
    """Multi-strip grid + multiple co blocks: slab reuse across (s, j)
    revisits and strip-boundary halo rows must stay exact."""
    monkeypatch.setattr(c2, "_FUSED_BUDGET", 800 * 2**10)
    B, H, W, C, Co = 1, 16, 8, 16, 256
    blk = c2._choose_blocks_fused(H, W, C, Co)
    assert blk is not None and blk[1] > 1 and Co // blk[0] > 1, blk
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.1
    a = jax.random.normal(ks[2], (B, C), jnp.float32) * 0.3 + 1.0
    s = jax.random.normal(ks[3], (B, C), jnp.float32) * 0.2
    out = c2.conv3x3_fused(x, w, None, scale=a, shift=s, dma=False)
    ref = _xla_fused_ref(x, w, jnp.zeros((Co,)), a, s, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_fused_split(_interpret_pallas, monkeypatch):
    """C-split path: prologue sliced per part, residual/bias on part 1."""
    B, H, W, C, Co = 1, 16, 32, 48, 32
    monkeypatch.setattr(c2, "_choose_blocks_fused",
                        lambda h, w, c, co, residual=True:
                        (None if c == C else
                         c2._choose_blocks_fused.__wrapped__(
                             h, w, c, co, residual)
                         if hasattr(c2._choose_blocks_fused, "__wrapped__")
                         else ((co, 1) if c < C else None)))
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (Co,), jnp.float32)
    a = jax.random.normal(ks[3], (B, C), jnp.float32) * 0.3 + 1.0
    s = jax.random.normal(ks[4], (B, C), jnp.float32) * 0.2
    res = jax.random.normal(ks[5], (B, H, W, Co), jnp.float32)
    assert c2._fused_split_point(H, W, C, Co) is not None
    out = c2.conv3x3_fused(x, w, b, scale=a, shift=s, residual=res,
                           dma=False)
    ref = _xla_fused_ref(x, w, b, a, s, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_eligibility_product_shapes(monkeypatch):
    monkeypatch.setenv("PANDORA_ENABLE_PCONV2", "1")
    # every ResBlock conv slab at both resolutions must route (whole or
    # split); the VMEM model is the arbiter, preflight the ground truth
    for (h, w, c, co) in [(40, 64, 320, 320), (20, 32, 640, 640),
                          (40, 64, 640, 320), (40, 64, 960, 320),
                          (36, 64, 960, 640), (72, 128, 320, 320),
                          (72, 128, 640, 320), (72, 128, 960, 320),
                          (72, 128, 8, 320)]:
        assert c2.conv3x3_fused_eligible(h, w, c, co), (h, w, c, co)
    # tiny levels stay on XLA
    assert not c2.conv3x3_fused_eligible(10, 16, 1280, 1280)
    # default off until the in-program A/B is measured
    monkeypatch.delenv("PANDORA_ENABLE_PCONV2")
    assert not c2.conv3x3_fused_eligible(40, 64, 320, 320)


@pytest.mark.parametrize("shape,pro", [
    ((32, 40, 64, 320, 320), True),   # L0 res: C%128!=0 -> block-fill path
    ((32, 40, 64, 8, 320), False),    # UNet input conv: tiny C, no prologue
    ((32, 20, 32, 640, 640), True),   # L1 res: lane-exact C -> manual DMA
])
def test_conv3x3_fused_tpu_mosaic_lowering(shape, pro):
    """Full Mosaic lowering (lowering_platforms=('tpu',)) at product B=32
    shapes. Interpret mode skips Pallas'/Mosaic's legality checks — two
    real-chip rejects slipped through it (2026-08-19): a (1, C) block over
    the (B, C) scale/shift arrays (second-to-last block dim must divide 8
    or equal the array dim), and manual HBM slices whose lane dim is not
    128-aligned against the padded tiling (C=8/C=320 slabs). This runs the
    real lowering on the CPU host and catches both classes pre-chip."""
    B, H, W, C, Co = shape
    x = jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16)
    w = jax.ShapeDtypeStruct((3, 3, C, Co), jnp.float32)
    b = jax.ShapeDtypeStruct((Co,), jnp.float32)
    a = jax.ShapeDtypeStruct((B, C), jnp.float32) if pro else None
    s = jax.ShapeDtypeStruct((B, C), jnp.float32) if pro else None
    r = jax.ShapeDtypeStruct((B, H, W, Co), jnp.bfloat16)

    def f(x, w, b, a, s, r):
        return c2.conv3x3_fused(x, w, b, scale=a, shift=s, residual=r)

    def f_nopro(x, w, b, r):
        return c2.conv3x3_fused(x, w, b, residual=r)

    if pro:
        jax.jit(f).trace(x, w, b, a, s, r).lower(lowering_platforms=("tpu",))
    else:
        jax.jit(f_nopro).trace(x, w, b, r).lower(lowering_platforms=("tpu",))


def test_resblock_fused_route_matches_baseline(monkeypatch):
    """ResBlock eval with the fused conv route (GN-stats fold + in-kernel
    prologue/epilogue) vs the unfused GN->conv->+emb->GN->conv->+skip
    composition: same params, same inputs, fp32."""
    import flax.linen  # noqa: F401  (import order)

    from open_pandora_tpu.models import unet3d as u3
    import importlib
    att = importlib.import_module("open_pandora_tpu.ops.attention")

    B, H, W, C, Co = 2, 16, 32, 64, 64
    block = u3.ResBlock(out_ch=Co, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, 48), jnp.float32)
    params = block.init(jax.random.PRNGKey(2), x, emb, batch_size=B)
    # perturb out_conv away from zero-init so the residual epilogue is live
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 if p.ndim == 4 else p, params)

    ref = block.apply(params, x, emb, batch_size=B)

    monkeypatch.setenv("PANDORA_ENABLE_PCONV2", "1")
    monkeypatch.setattr(att, "_on_tpu", lambda: True)
    monkeypatch.setattr(c2.pl, "pallas_call",
                        functools.partial(c2.pl.pallas_call, interpret=True))
    assert c2.conv3x3_fused_eligible(H, W, C, Co)
    out = block.apply(params, x, emb, batch_size=B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_resblock_fused_route_channel_change(monkeypatch):
    """in_ch != out_ch: the 1x1 skip_connection feeds the kernel residual."""
    from open_pandora_tpu.models import unet3d as u3
    import importlib
    att = importlib.import_module("open_pandora_tpu.ops.attention")

    B, H, W, C, Co = 1, 16, 32, 32, 64
    block = u3.ResBlock(out_ch=Co, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, C), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (B, 48), jnp.float32)
    params = block.init(jax.random.PRNGKey(5), x, emb, batch_size=B)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 if p.ndim == 4 else p, params)
    ref = block.apply(params, x, emb, batch_size=B)

    monkeypatch.setenv("PANDORA_ENABLE_PCONV2", "1")
    monkeypatch.setattr(att, "_on_tpu", lambda: True)
    monkeypatch.setattr(c2.pl, "pallas_call",
                        functools.partial(c2.pl.pallas_call, interpret=True))
    out = block.apply(params, x, emb, batch_size=B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_ninedot_matches_lax_conv():
    """conv3x3_ninedot (round-5 shifted-dot formulation) vs the XLA conv,
    fp32 exact up to reduction order."""
    from open_pandora_tpu.ops.conv2d import conv3x3_ninedot
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 10, 12, 24), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 24, 16), jnp.float32) * 0.1
    b = jax.random.normal(k3, (16,), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = conv3x3_ninedot(x, w, b)
    assert jnp.max(jnp.abs(got - ref)) < 1e-4


def test_ninedot_routing_flag(monkeypatch):
    """PANDORA_SPATIAL_DOT routes _SConv3x3's default path through the
    nine-dot form; outputs must match the conv emitter path."""
    from open_pandora_tpu.models.unet3d import _SConv3x3
    mod = _SConv3x3(features=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 12), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)
    base = mod.apply(params, x)
    monkeypatch.setenv("PANDORA_SPATIAL_DOT", "1")
    routed = mod.apply(params, x)
    assert jnp.max(jnp.abs(routed - base)) < 1e-4


def test_ninedot_grad_matches_conv():
    from open_pandora_tpu.ops.conv2d import conv3x3_ninedot
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (1, 6, 6, 8), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 8, 8), jnp.float32) * 0.1

    def loss_nine(w):
        return jnp.sum(conv3x3_ninedot(x, w) ** 2)

    def loss_conv(w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_nine)(w)
    g2 = jax.grad(loss_conv)(w)
    assert jnp.max(jnp.abs(g1 - g2)) < 1e-3
