"""Finetune train step on an 8-device CPU mesh: loss decreases, ZeRO-2
sharding specs hold, DP batch is actually sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import TrainConfig
from open_pandora_tpu.train.step import TrainState, make_finetune_step
from open_pandora_tpu.train.optim import make_optimizer, trainable_partition
from tests.test_dynamicrafter import TINY, H, W, T
from open_pandora_tpu.models.dynamicrafter import DynamiCrafter

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host

TCFG = TrainConfig(learning_rate=1e-4, uncond_prob=0.1, grad_clip_norm=0.5,
                   max_steps=100)


def _batch(b):
    k = jax.random.PRNGKey(0)
    return {
        "video": jax.random.uniform(k, (b, T, H, W, 3)) * 2 - 1,
        "cond_frames": jax.random.uniform(k, (b, 1, H, W, 3)) * 2 - 1,
        "cond_images": jax.random.uniform(k, (b, 28, 28, 3)),
        "text_tokens": jnp.zeros((b, 7), jnp.int32),
        "fps": jnp.full((b,), 8, jnp.int32),
    }


@pytest.fixture(scope="module")
def setup():
    model = DynamiCrafter(TINY)
    params = model.init_params(jax.random.PRNGKey(0), height=H, width=W)
    return model, params


def test_partition(setup):
    _, params = setup
    tr, fr = trainable_partition(params, "dynamicrafter")
    assert set(tr) == {"unet"}
    assert set(fr) == {"vae", "clip_text", "clip_img", "resampler"}
    tr2, _ = trainable_partition(params, "alignment")
    assert tr2 == {}  # connector not in DynamiCrafter-only params


def test_single_device_step_decreases_loss(setup):
    model, params = setup
    step, tx = make_finetune_step(model, TCFG)
    state = TrainState.create(params, "dynamicrafter", tx)
    batch = _batch(2)
    losses = []
    for i in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(42))  # same noise
        losses.append(float(m["loss"]))
    assert int(state.step) == 4
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # frozen params untouched
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool((a == b).all()), state.frozen,
        trainable_partition(params, "dynamicrafter")[1]))


def test_mesh_step_matches_and_shards(setup, mesh8):
    model, params = setup
    step, tx = make_finetune_step(model, TCFG, mesh_spec=mesh8)
    state = step.shard_state(TrainState.create(params, "dynamicrafter", tx))
    batch = _batch(8)
    state2, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # ZeRO-2: large adam moments sharded over data axis
    mu = state2.opt_state[1][0].mu["unet"]["params"]["input_blocks_0_0"]["kernel"]
    assert len(mu.sharding.device_set) == 8
    # params replicated
    k = state2.trainable["unet"]["params"]["input_blocks_0_0"]["kernel"]
    assert k.sharding.is_fully_replicated


def test_fsdp_step_matches_replicated(setup, mesh8):
    """FSDP analog (ChatUniVi/train/train.py:974): param leaves sharded
    over the data axis, numerics identical to the replicated mesh step."""
    model, params = setup
    step_r, tx = make_finetune_step(model, TCFG, mesh_spec=mesh8)
    step_f, _ = make_finetune_step(model, TCFG, mesh_spec=mesh8, fsdp=True)
    batch = _batch(8)
    sr = step_r.shard_state(TrainState.create(params, "dynamicrafter", tx))
    sf = step_f.shard_state(TrainState.create(params, "dynamicrafter", tx))
    # large param leaves actually sharded (min_size 2^16 on fp32)
    from open_pandora_tpu.parallel.mesh import fsdp_param_spec
    specs = fsdp_param_spec(mesh8, sf.trainable)
    n_sharded = sum(
        not s.is_fully_replicated
        for s in jax.tree_util.tree_leaves(specs))
    assert n_sharded > 0
    sr2, mr = step_r(sr, batch, jax.random.PRNGKey(2))
    sf2, mf = step_f(sf, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(mf["loss"]))
    np.testing.assert_allclose(float(mf["loss"]), float(mr["loss"]),
                               rtol=2e-5)
    # updated params agree leaf-for-leaf
    fr = jax.tree_util.tree_map(np.asarray, sr2.trainable)
    ff = jax.tree_util.tree_map(np.asarray, sf2.trainable)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6, rtol=2e-5),
        fr, ff)
