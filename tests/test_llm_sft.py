"""ChatUniVi LLM SFT step: label building, loss masking, step progress."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import TrainConfig
from open_pandora_tpu.models.world_model import round1_prompt
from open_pandora_tpu.train.llm_step import (IGNORE_INDEX, build_labels,
                                             make_llm_sft_step, sft_loss)
from open_pandora_tpu.train.step import TrainState
from tests.test_llm_stack import tiny_wm  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


def _prompt_and_labels(wm):
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    ids = jnp.asarray([[1, 7, 9, 4]], jnp.int32)
    prompt = round1_prompt(ids, images=images, prefix_len=4)
    labels = build_labels(wm, prompt)
    return prompt, labels


def test_build_labels_alignment(tiny_wm):
    wm, params = tiny_wm
    prompt, labels = _prompt_and_labels(wm)
    embeds, _ = wm.build_inputs_embeds(params, prompt)
    assert labels.shape == embeds.shape[:2]
    # bos(1) + image(4 feats: rates 2+1+1) + text(3) + prefix(4) = 12
    lab = np.asarray(labels[0])
    assert lab[0] == 1                       # bos supervised
    assert (lab[1:5] == IGNORE_INDEX).all()  # image features masked
    assert list(lab[5:8]) == [7, 9, 4]       # text supervised
    assert (lab[8:] == IGNORE_INDEX).all()   # prefix masked


def test_sft_loss_and_step(tiny_wm):
    wm, params = tiny_wm
    prompt, labels = _prompt_and_labels(wm)
    tcfg = TrainConfig(learning_rate=1e-3, grad_clip_norm=1.0, max_steps=10)
    step, tx = make_llm_sft_step(wm, tcfg)
    state = TrainState.create(params, "llm_sft", tx)
    assert set(state.trainable) == {"llama", "mm_projector"}
    batch = {"prompt": prompt, "labels": labels}
    losses = []
    for _ in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(m["n_supervised"])) == 3  # shifted: 3 text tokens


def test_prompt_is_pytree(tiny_wm):
    wm, _ = tiny_wm
    prompt, _ = _prompt_and_labels(wm)
    leaves = jax.tree_util.tree_leaves(prompt)
    assert len(leaves) == 3  # bos ids + text ids + image stack
    rebuilt = jax.tree_util.tree_map(lambda x: x, prompt)
    assert rebuilt.segments[1].index == prompt.segments[1].index
