"""UNet3D structure + behavior tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import UNet3DConfig
from open_pandora_tpu.models.unet3d import UNetModel

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host

TINY = UNet3DConfig(
    in_channels=8, out_channels=4, model_channels=64,
    channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1,),
    num_head_channels=32, context_dim=64, temporal_length=4,
    text_context_len=7, img_tokens_per_frame=2, dropout=0.0,
)
B, T, H, W = 1, 4, 8, 8


@pytest.fixture(scope="module")
def unet_and_params():
    model = UNetModel(TINY)
    x = jnp.zeros((B, T, H, W, 8))
    ctx = jnp.zeros((B, 7 + T * 2, 64))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), ctx)
    return model, params


def test_forward_shape_and_finite(unet_and_params):
    model, params = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 7 + T * 2, 64))
    y = model.apply(params, x, jnp.array([500]), ctx,
                    fs=jnp.array([3], jnp.int32))
    assert y.shape == (B, T, H, W, 4)
    assert bool(jnp.isfinite(y).all())


def test_zero_init_gives_zero_output(unet_and_params):
    """out conv is zero-init (openaimodel3d.py basics zero_module) ->
    untrained UNet output is exactly 0."""
    model, params = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 7 + T * 2, 64))
    y = model.apply(params, x, jnp.array([0]), ctx)
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_context_modes(unet_and_params):
    """Both context layouts work: per-frame image tokens (77+t*16 analogue)
    and plain text-only context (repeat_interleave path,
    openaimodel3d.py:558-567)."""
    model, params = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, 8))
    ctx_full = jax.random.normal(jax.random.PRNGKey(2), (B, 7 + T * 2, 64))
    ctx_text = ctx_full[:, :7]
    y1 = model.apply(params, x, jnp.array([10]), ctx_full)
    y2 = model.apply(params, x, jnp.array([10]), ctx_text)
    assert y1.shape == y2.shape


def test_timestep_and_fs_sensitivity(unet_and_params):
    """At init every timestep-dependent path ends in a zero-init conv
    (reference zero_module semantics), so perturb those kernels; the output
    must then depend on t — checks the conditioning plumbing end-to-end."""
    model, params = unet_and_params
    import flax
    flat = flax.traverse_util.flatten_dict(params["params"])
    for key in list(flat):
        # un-zero every zero-init kernel (out convs, proj_outs)
        if key[-1] == "kernel" and float(jnp.abs(flat[key]).sum()) == 0.0:
            flat[key] = jnp.full_like(flat[key], 0.01)
    p = {"params": flax.traverse_util.unflatten_dict(flat)}
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 7 + T * 2, 64))
    y_t0 = model.apply(p, x, jnp.array([0]), ctx)
    y_t900 = model.apply(p, x, jnp.array([900]), ctx)
    assert not np.allclose(np.asarray(y_t0), np.asarray(y_t900))


def test_block_structure(unet_and_params):
    _, params = unet_and_params
    names = set(params["params"].keys())
    # tiny config: levels (1,2), 1 res/level -> input blocks 0..3
    assert {"input_blocks_0_0", "input_blocks_1_0", "input_blocks_2_0",
            "input_blocks_3_0", "init_attn", "middle_block_0",
            "middle_block_1", "middle_block_2", "middle_block_3",
            "out_norm", "out_conv", "time_embed_0", "fps_embedding_0"} <= names
    # attention only at ds=1 (level 0)
    assert "input_blocks_1_1" in names       # spatial transformer at level 0
    assert "input_blocks_3_1" not in names   # no attn at ds=2
    # dual-stream image cross-attention present
    attn2 = params["params"]["input_blocks_1_1"]["transformer_blocks_0"]["attn2"]
    assert "to_k_ip" in attn2 and "to_v_ip" in attn2
