"""Multi-chip synthesis paths (parallel/sharded_infer.py) on the virtual
8-device CPU mesh: sharded must equal unsharded."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import MeshConfig
from open_pandora_tpu.parallel.mesh import build_mesh
from open_pandora_tpu.parallel.sharded_infer import (sharded_decode,
                                                     sharded_synthesis)

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


@pytest.fixture(scope="module")
def tiny():
    from tests.test_dynamicrafter import TINY, H, W
    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter
    model = DynamiCrafter(TINY)
    params = model.init_params(jax.random.PRNGKey(0), height=H, width=W)
    return model, params, H, W


def _synth_kwargs(model, H, W, key):
    b = 1
    cfg = model.cfg
    text_ctx = jax.random.normal(
        jax.random.fold_in(key, 1),
        (b, cfg.unet.text_context_len, cfg.unet.context_dim)) * 0.2
    cond_images = jax.random.uniform(jax.random.fold_in(key, 2), (b, H, W, 3))
    cond_frames = cond_images[:, None] * 2.0 - 1.0
    return dict(text_context=text_ctx, cond_images=cond_images,
                cond_frames=cond_frames, key=jax.random.fold_in(key, 3),
                ddim_steps=3, guidance_scale=7.5, fs=3)


def test_sharded_synthesis_matches_unsharded(tiny, cpu_devices):
    model, params, H, W = tiny
    assert len(cpu_devices) == 8
    # CFG pair = 2 streams -> dp must divide 2
    ms = build_mesh(MeshConfig(data_parallel=2, model_parallel=1),
                    devices=cpu_devices[:2])
    kw = _synth_kwargs(model, H, W, jax.random.PRNGKey(5))
    ref = model.image_guided_synthesis(params, **kw)
    out = sharded_synthesis(model, ms, params, **kw)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sharded_synthesis_batch_over_8(tiny, cpu_devices):
    """b=4 clips x 2 CFG streams = 8 shards on the full mesh."""
    model, params, H, W = tiny
    ms = build_mesh(MeshConfig(data_parallel=8, model_parallel=1),
                    devices=cpu_devices)
    kw = _synth_kwargs(model, H, W, jax.random.PRNGKey(6))
    kw = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0)
        if hasattr(x, "ndim") and x.ndim >= 2 else x, kw)
    ref = model.image_guided_synthesis(params, **kw)
    out = sharded_synthesis(model, ms, params, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sharded_synthesis_rejects_bad_mesh(tiny, cpu_devices):
    model, params, H, W = tiny
    ms = build_mesh(MeshConfig(data_parallel=3, model_parallel=1),
                    devices=cpu_devices[:3])
    kw = _synth_kwargs(model, H, W, jax.random.PRNGKey(7))
    with pytest.raises(ValueError, match="not divisible"):
        sharded_synthesis(model, ms, params, **kw)


def test_sharded_decode_matches_unsharded(tiny, cpu_devices):
    model, params, H, W = tiny
    T = model.cfg.unet.temporal_length
    ms = build_mesh(MeshConfig(data_parallel=4, model_parallel=1),
                    devices=cpu_devices[:4])
    z = jax.random.normal(jax.random.PRNGKey(8),
                          (1, T, H // 2, W // 2, model.cfg.vae.z_channels))
    ref = model.decode(params, z)
    out = sharded_decode(model, ms, params, z)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
