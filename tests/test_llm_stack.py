"""LLM stack tests: DPC-KNN clustering, LLaMA trunk, connector, and the
WorldModel conditioning path end-to-end (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import (ClusterConfig, ConnectorConfig,
                                          LLaMAConfig, CLIPTowerConfig,
                                          QFormerConfig)
from open_pandora_tpu.models.cluster import (cluster_dpc_knn, merge_tokens,
                                             project_image_tokens,
                                             project_video_tokens)
from open_pandora_tpu.models.connector import Connector
from open_pandora_tpu.models.llama import LlamaForCausalLM, LlamaTrunk
from open_pandora_tpu.models.world_model import (ImageSegment, MultimodalPrompt,
                                                 PrefixSegment, TokenSegment,
                                                 VideoSegment, WorldModel,
                                                 round1_prompt)
from tests.test_dynamicrafter import TINY as TINY_DC, H, W

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


# ---------------------------------------------------------------------------
# clustering
# ---------------------------------------------------------------------------


def test_dpc_knn_recovers_separated_clusters():
    """3 well-separated blobs -> 3 clusters matching ground truth."""
    rng = np.random.RandomState(0)
    blobs = [rng.randn(10, 8) * 0.05 + center
             for center in (np.zeros(8), np.full(8, 5.0), np.full(8, -5.0))]
    x = jnp.asarray(np.concatenate(blobs)[None], dtype=jnp.float32)
    idx, centers = cluster_dpc_knn(x, 3, k=5)
    idx = np.asarray(idx[0])
    # each blob maps to exactly one cluster id, all three distinct
    groups = [set(idx[i * 10:(i + 1) * 10].tolist()) for i in range(3)]
    assert all(len(g) == 1 for g in groups)
    assert len(set.union(*groups)) == 3


def test_merge_tokens_is_cluster_mean():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 6, 2))
    idx = jnp.asarray([[0, 0, 1, 1, 1, 0]])
    out = merge_tokens(x, idx, 2)
    xe = np.arange(12, dtype=np.float32).reshape(6, 2)
    np.testing.assert_allclose(np.asarray(out[0, 0]), xe[[0, 1, 5]].mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 1]), xe[[2, 3, 4]].mean(0), rtol=1e-5)


def test_merge_tokens_respects_mask_weights():
    x = jnp.asarray(np.stack([np.zeros(2), np.ones(2) * 100, np.ones(2)])[None],
                    dtype=jnp.float32)
    idx = jnp.asarray([[0, 0, 1]])
    w = jnp.asarray([[1.0, 0.0, 1.0]])  # token 1 masked out
    out = merge_tokens(x, idx, 2, w)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.0, 0.0], atol=1e-4)


def test_project_image_tokens_shape():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
    out = project_image_tokens(x, rates=(4, 2, 1))
    assert out.shape == (2, 7, 8)


def test_project_video_tokens_events():
    # 4 frames, temporal rate 1/2 -> 2 events; rates (2,1,1) -> 4 tokens/event
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 8))
    out = project_video_tokens(x, rates=(2, 1, 1), temporal_rate=0.5)
    assert out.shape == (1, 8, 8)
    assert bool(jnp.isfinite(out).all())


def test_project_video_single_event_matches_unmasked():
    """T=2 frames, rate 1/16 -> 1 event containing every frame: the masked
    event clustering must equal clustering all tokens unmasked."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8))
    out = project_video_tokens(x, rates=(2, 1, 1), temporal_rate=1 / 16)
    from open_pandora_tpu.models.cluster import ctm_down
    lvl0 = ctm_down(x, 2, 5)
    direct0 = ctm_down(lvl0.reshape(1, -1, 8), 2, 5)
    np.testing.assert_allclose(np.asarray(out[:, :2]), np.asarray(direct0),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# llama
# ---------------------------------------------------------------------------

TINY_LLAMA = LLaMAConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                         num_heads=2)


def test_llama_causality():
    model = LlamaForCausalLM(TINY_LLAMA)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    e = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64))
    h1 = model.apply(params, e, method=LlamaForCausalLM.trunk)
    e2 = e.at[:, -1].set(99.0)  # change ONLY the last position
    h2 = model.apply(params, e2, method=LlamaForCausalLM.trunk)
    np.testing.assert_allclose(np.asarray(h1[:, :-1]), np.asarray(h2[:, :-1]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(h1[:, -1]), np.asarray(h2[:, -1]))


def test_llama_lm_head_shape():
    model = LlamaForCausalLM(TINY_LLAMA)
    ids = jnp.ones((2, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 5, TINY_LLAMA.total_vocab)
    # embedding covers the 3 extra multimodal tokens
    emb = model.apply(params, jnp.array([[32000, 32001, 32002]]),
                      method=LlamaForCausalLM.embed)
    assert emb.shape == (1, 3, 64)


# ---------------------------------------------------------------------------
# connector + world model
# ---------------------------------------------------------------------------

TINY_QF = QFormerConfig(hidden_size=32, num_layers=2, num_heads=2,
                        intermediate_size=64, cross_attention_frequency=2,
                        num_query_tokens=7)
TINY_CONN = ConnectorConfig(llm_hidden=64, image_prefix_length=4,
                            qformer_proj_dim=32, proj_out_dim=64)


def test_connector_shapes():
    conn = Connector(TINY_CONN, TINY_QF)
    h = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 64))
    params = conn.init(jax.random.PRNGKey(1), h)
    out = conn.apply(params, h)
    assert out.shape == (3, 7, 64)
    rows = conn.apply(params, method=Connector.prefix_embeddings)
    assert rows.shape == (4, 64)


def tiny_wm_cfg():
    import dataclasses
    return dataclasses.replace(
        TINY_DC,
        llama=TINY_LLAMA,
        clip_tower=CLIPTowerConfig(image_size=28, patch_size=14, width=64,
                                   layers=2, heads=2, select_layer=-2),
        cluster=ClusterConfig(spatial_rates=(2, 1, 1), temporal_rate=0.5),
        qformer=TINY_QF,
        connector=TINY_CONN,
    )


def tiny_wm_fixture():
    cfg = tiny_wm_cfg()
    wm = WorldModel(cfg)
    params = wm.init_params(jax.random.PRNGKey(0), height=H, width=W)
    return wm, params


@pytest.fixture(scope="module")
def tiny_wm():
    return tiny_wm_fixture()


def test_conditioning_single_round(tiny_wm):
    wm, params = tiny_wm
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    ids = jnp.ones((1, 4), jnp.int32)
    prompt = round1_prompt(ids, images=images, prefix_len=4)
    cond = wm.get_diffusion_conditioning(params, prompt)
    assert cond.shape == (1, 1, 7, 64)  # (b, rounds, queries, out_dim)
    assert bool(jnp.isfinite(cond).all())


def test_conditioning_multi_round(tiny_wm):
    wm, params = tiny_wm
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 28, 28, 3))
    ids = jnp.ones((1, 3), jnp.int32)
    prompt = MultimodalPrompt(
        segments=[TokenSegment(ids[:, :1]), ImageSegment(0),
                  TokenSegment(ids), PrefixSegment(4),
                  VideoSegment((1, 2)), TokenSegment(ids), PrefixSegment(4)],
        images=images)
    cond = wm.get_diffusion_conditioning(params, prompt)
    assert cond.shape == (1, 2, 7, 64)


def test_generate_end_to_end(tiny_wm):
    wm, params = tiny_wm
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    ids = jnp.ones((1, 4), jnp.int32)
    prompt = round1_prompt(ids, images=images, prefix_len=4)
    z = wm.generate(
        params, prompt,
        cond_images=images[:, 0],
        cond_frames=jax.random.uniform(jax.random.PRNGKey(2), (1, 1, H, W, 3)) * 2 - 1,
        key=jax.random.PRNGKey(3), ddim_steps=2, guidance_scale=4.0)
    assert z.shape == (1, 4, H // 2, W // 2, 4)
    assert bool(jnp.isfinite(z).all())


def test_alignment_loss(tiny_wm):
    wm, params = tiny_wm
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 28, 28, 3))
    ids = jnp.ones((1, 4), jnp.int32)
    prompt = round1_prompt(ids, images=images, prefix_len=4)
    caption = jnp.zeros((1, 7), jnp.int32)
    loss = wm.alignment_loss(params, prompt, caption)
    assert np.isfinite(float(loss)) and float(loss) >= 0
