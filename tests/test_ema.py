"""EMA shadow params (reference LitEma, lvdm/ema.py) + the
use_diffusion_text_encoder conditioning branch (model.py:97-98,1214-1306)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.train.ema import (ema_decay_for_step, ema_init,
                                        ema_update)


def test_ema_decay_warmup_ramp():
    # ema.py:29-35: (1+n)/(10+n) capped at decay
    assert float(ema_decay_for_step(jnp.asarray(0))) == pytest.approx(0.1)
    assert float(ema_decay_for_step(jnp.asarray(90))) == pytest.approx(0.91)
    assert float(ema_decay_for_step(jnp.asarray(10**7))) == pytest.approx(
        0.9999)
    assert float(ema_decay_for_step(jnp.asarray(0), warmup=False)) == \
        pytest.approx(0.9999)


def test_ema_update_moves_toward_params():
    shadow = {"w": jnp.zeros((4,))}
    params = {"w": jnp.ones((4,))}
    out = ema_update(shadow, params, jnp.asarray(0))  # d = 0.1
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9, rtol=1e-6)
    # fixed point: shadow == params stays put
    out2 = ema_update(params, params, jnp.asarray(100))
    np.testing.assert_allclose(np.asarray(out2["w"]), 1.0, rtol=1e-6)


@pytest.mark.slow  # ~100 s: jits a full train-step pair (round-5 re-tier)
def test_ema_in_train_state():
    from open_pandora_tpu.core.config import TrainConfig
    from open_pandora_tpu.train.step import TrainState, make_finetune_step
    from open_pandora_tpu.models.dynamicrafter import DynamiCrafter
    from tests.test_dynamicrafter import TINY, H, W

    model = DynamiCrafter(TINY)
    params = model.init_params(jax.random.PRNGKey(0), height=H, width=W)
    tcfg = TrainConfig(learning_rate=1e-3, uncond_prob=0.0, max_steps=10,
                       use_ema=True, ema_decay=0.9999)
    step, tx = make_finetune_step(model, tcfg)
    state = TrainState.create(params, "dynamicrafter", tx, use_ema=True)
    assert state.ema is not None
    ema_snapshot = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), state.ema)

    T = TINY.unet.temporal_length
    k = jax.random.PRNGKey(1)
    batch = {
        "video": jax.random.uniform(k, (1, T, H, W, 3)) * 2 - 1,
        "cond_frames": jax.random.uniform(k, (1, 1, H, W, 3)) * 2 - 1,
        "cond_images": jax.random.uniform(k, (1, 28, 28, 3)),
        "text_tokens": jnp.zeros((1, TINY.clip_text.context_length),
                                 jnp.int32),
        "fps": jnp.full((1,), 8, jnp.int32),
    }
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    d = 0.1  # step 0 warmup decay
    moved = 0
    for e0, e1, p1 in zip(jax.tree_util.tree_leaves(ema_snapshot),
                          jax.tree_util.tree_leaves(state.ema),
                          jax.tree_util.tree_leaves(state.trainable)):
        expect = np.asarray(e0) * d + (1 - d) * np.asarray(p1)
        np.testing.assert_allclose(np.asarray(e1), expect, atol=1e-5)
        if not np.allclose(np.asarray(e1), np.asarray(e0)):
            moved += 1
    assert moved > 0, "no EMA leaf moved after a train step"


def test_text_embedding_encoder_branch():
    from open_pandora_tpu.models.world_model import WorldModel, round1_prompt
    from tests.test_llm_stack import tiny_wm_cfg
    from tests.test_dynamicrafter import H, W

    cfg = tiny_wm_cfg()
    cfg = dataclasses.replace(cfg, connector=dataclasses.replace(
        cfg.connector, use_diffusion_text_encoder=True))
    wm = WorldModel(cfg)
    assert wm.text_embedding_encoder is not None
    params = wm.init_params(jax.random.PRNGKey(0), height=H, width=W)
    assert "text_embedding_encoder" in params

    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    ids = jnp.ones((1, 4), jnp.int32)
    prompt = round1_prompt(ids, images=images, prefix_len=4)
    cond = wm.get_diffusion_conditioning(params, prompt)
    assert cond.shape == (1, 1, cfg.qformer.num_query_tokens,
                          cfg.connector.proj_out_dim)
    assert bool(jnp.isfinite(cond).all())
    # the branch actually changes the conditioning
    wm0 = WorldModel(tiny_wm_cfg())
    p0 = {k: v for k, v in params.items() if k != "text_embedding_encoder"}
    cond0 = wm0.get_diffusion_conditioning(p0, prompt)
    assert not np.allclose(np.asarray(cond), np.asarray(cond0), atol=1e-5)
