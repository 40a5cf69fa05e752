"""LoRA adapters for the LLaMA trunk (reference ChatUniVi train.py:98-103
lora_enable, builder.py:36-47 merge)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import LLaMAConfig
from open_pandora_tpu.models.llama import LlamaForCausalLM
from open_pandora_tpu.models.lora import add_lora_params, merge_lora_params
from open_pandora_tpu.train.optim import (deep_merge, split_tree,
                                          trainable_partition)

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host

TINY = LLaMAConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                   num_heads=2)
TINY_LORA = dataclasses.replace(TINY, lora_rank=4, lora_alpha=8.0)


def _models_and_params():
    plain = LlamaForCausalLM(TINY)
    lora = LlamaForCausalLM(TINY_LORA)
    ids = jnp.asarray([[1, 5, 9, 2, 7]], jnp.int32)
    pp = plain.init(jax.random.PRNGKey(0), ids)
    template = lora.init(jax.random.PRNGKey(1), ids)
    lp = add_lora_params(jax.random.PRNGKey(2), pp, template)
    return plain, lora, pp, lp, ids


def test_lora_zero_delta_at_init():
    plain, lora, pp, lp, ids = _models_and_params()
    ref = plain.apply(pp, ids)
    out = lora.apply(lp, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_lora_merge_matches_adapter_forward():
    plain, lora, pp, lp, ids = _models_and_params()
    # perturb the adapters so the delta is nonzero
    lp = jax.tree_util.tree_map_with_path(
        lambda path, x: (x + 0.02 * jax.random.normal(
            jax.random.PRNGKey(hash(str(path)) % (2 ** 31)), x.shape)
            if str(path[-1]).find("lora_b") >= 0 else x), lp)
    adapter_out = lora.apply(lp, ids)
    merged = merge_lora_params(lp, alpha=TINY_LORA.lora_alpha,
                               rank=TINY_LORA.lora_rank)
    merged_out = plain.apply(merged, ids)
    np.testing.assert_allclose(np.asarray(merged_out),
                               np.asarray(adapter_out), atol=1e-4, rtol=1e-4)
    assert not np.allclose(np.asarray(adapter_out),
                           np.asarray(plain.apply(pp, ids)))


def test_lora_partition_and_deep_merge():
    _, _, _, lp, _ = _models_and_params()
    params = {"llama": lp, "mm_projector": {"proj": {"kernel": jnp.ones(2)}}}
    trainable, frozen = trainable_partition(params, "llm_sft_lora")
    t_leaves = jax.tree_util.tree_leaves_with_path(trainable)
    assert t_leaves, "no trainable leaves selected"
    for path, _ in t_leaves:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        assert ("mm_projector" in keys
                or any(k in ("lora_a", "lora_b") for k in keys)), keys
    f_leaves = jax.tree_util.tree_leaves_with_path(frozen)
    for path, _ in f_leaves:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        assert not any(k in ("lora_a", "lora_b") for k in keys)
    merged = deep_merge(trainable, frozen)
    n_all = len(jax.tree_util.tree_leaves(params))
    assert len(jax.tree_util.tree_leaves(merged)) == n_all


def test_lora_sft_step_trains_adapters_only():
    from open_pandora_tpu.core.config import TrainConfig
    from open_pandora_tpu.models.world_model import round1_prompt
    from open_pandora_tpu.train.llm_step import build_labels, make_llm_sft_step
    from open_pandora_tpu.train.step import TrainState
    from tests.test_llm_stack import tiny_wm_cfg
    from open_pandora_tpu.models.world_model import WorldModel
    from tests.test_dynamicrafter import H, W

    cfg = tiny_wm_cfg()
    cfg = dataclasses.replace(cfg, llama=dataclasses.replace(
        cfg.llama, lora_rank=4, lora_alpha=8.0))
    wm = WorldModel(cfg)
    params = wm.init_params(jax.random.PRNGKey(0), height=H, width=W)

    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    ids = jnp.asarray([[1, 7, 9, 4]], jnp.int32)
    prompt = round1_prompt(ids, images=images, prefix_len=4)
    labels = build_labels(wm, prompt)

    tcfg = TrainConfig(learning_rate=1e-2, grad_clip_norm=1.0, max_steps=10)
    step, tx = make_llm_sft_step(wm, tcfg)
    state = TrainState.create(params, "llm_sft_lora", tx)
    # frozen base kernel must not move; adapters must
    base_before = np.asarray(jax.tree_util.tree_leaves(
        state.frozen["llama"])[0])
    losses = []
    batch = {"prompt": prompt, "labels": labels}
    for _ in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    base_after = np.asarray(jax.tree_util.tree_leaves(
        state.frozen["llama"])[0])
    np.testing.assert_array_equal(base_before, base_after)
