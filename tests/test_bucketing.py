"""Prompt-length bucketing: padded+masked text spans give the SAME
conditioning as unpadded prompts (pads are attention-masked and
position-transparent) and reuse one XLA trace per bucket (VERDICT round-1
weak #4; SURVEY §7.0 bucketed-text-span row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.models.world_model import (MultimodalPrompt,
                                                 round1_prompt)
from tests.test_llm_stack import tiny_wm  # noqa: F401 (fixture)


def _bucketed(ids_row, bucket):
    n = len(ids_row)
    ids = np.zeros((1, bucket), np.int32)
    ids[0, :n] = ids_row
    mask = np.zeros((1, bucket), bool)
    mask[0, :n] = True
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.slow  # ~110 s incl. tiny_wm build (round-5 re-tier)
def test_bucketed_conditioning_matches_exact(tiny_wm):
    wm, params = tiny_wm
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    raw = [1, 7, 9, 4, 11]

    exact = wm.get_diffusion_conditioning(
        params, round1_prompt(jnp.asarray([raw], jnp.int32), images=images,
                              prefix_len=4))

    ids, mask = _bucketed(raw, 12)
    bucketed = wm.get_diffusion_conditioning(
        params, round1_prompt(ids, images=images, prefix_len=4,
                              text_mask=mask))

    np.testing.assert_allclose(np.asarray(exact), np.asarray(bucketed),
                               rtol=2e-5, atol=2e-5)


def test_one_trace_per_bucket(tiny_wm):
    wm, params = tiny_wm
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))

    jf = jax.jit(lambda pr, p: wm.get_diffusion_conditioning(pr, p))
    for raw in ([1, 5, 6], [1, 8, 2, 9, 3]):  # different lengths, one bucket
        ids, mask = _bucketed(raw, 8)
        out = jf(params, round1_prompt(ids, images=images, prefix_len=4,
                                       text_mask=mask))
        assert bool(jnp.isfinite(out).all())
    assert jf._cache_size() == 1, "same bucket must reuse one trace"


def test_chatwm_ids_bucketing():
    from open_pandora_tpu.pipeline.chat_wm import ChatWM
    from open_pandora_tpu.pipeline.tokenizers import HashFallbackTokenizer

    class Dummy(ChatWM):
        def __init__(self):
            self.tokenizer = HashFallbackTokenizer()

    d = Dummy()
    ids, mask = d._ids("drive down the road", add_bos=True)
    assert ids.shape == (1, 16) and mask.shape == (1, 16)
    assert int(mask.sum()) == 5  # bos + 4 words
    ids2, mask2 = d._ids("a much longer action description " * 5,
                         add_bos=False)  # 25 words -> bucket 32
    assert ids2.shape == (1, 32)
    # beyond the largest bucket: exact length, everything real
    long = "w " * 300
    ids3, mask3 = d._ids(long, add_bos=False)
    assert ids3.shape[1] == 300 and bool(mask3.all())
