"""Cross-implementation parity for the alternative encoders
(models/encoders_extra.py) vs transformers' torch modules with identical
randomly initialized weights, plus behavioral tests for the ucg paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import CLIPTextConfig, T5Config
from open_pandora_tpu.models import encoders_extra as ee

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_t5_encoder_matches_transformers():
    import transformers as tf

    hf_cfg = tf.T5Config(
        vocab_size=97, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False)
    torch.manual_seed(0)
    ref = tf.T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(vocab_size=97, d_model=32, d_kv=8, d_ff=48, num_layers=2,
                   num_heads=4, relative_buckets=8, relative_max_distance=16)
    params = ee.convert_t5_encoder(ref.state_dict(), cfg)

    ids = np.array([[3, 14, 15, 92, 65, 35, 0, 0],
                    [8, 9, 7, 9, 3, 2, 3, 8]], np.int64)
    with torch.no_grad():
        # reference passes NO attention mask (condition.py:84-86)
        want = ref(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    got = ee.T5Encoder(cfg).apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def _tiny_hf_clip():
    import transformers as tf

    hf_cfg = tf.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        eos_token_id=98, attention_dropout=0.0)
    torch.manual_seed(1)
    ref = tf.CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(vocab_size=99, width=32, layers=2, heads=4,
                         context_length=16, penultimate=False)
    params = ee.convert_hf_clip_text(ref.state_dict(), cfg)
    # eos (= max id 98) exactly once per row so argmax pooling is unambiguous
    ids = np.array([[49, 14, 15, 92, 98, 35, 1, 1],
                    [8, 9, 7, 98, 3, 2, 1, 1]], np.int64)
    return ref, cfg, params, ids


@pytest.mark.parametrize("layer,layer_idx", [("last", None), ("pooled", None),
                                             ("hidden", 1), ("hidden", -2)])
def test_hf_clip_text_matches_transformers(layer, layer_idx):
    ref, cfg, params, ids = _tiny_hf_clip()
    with torch.no_grad():
        out = ref(input_ids=torch.tensor(ids), output_hidden_states=True)
    if layer == "last":
        want = out.last_hidden_state.numpy()
    elif layer == "pooled":
        want = out.pooler_output.numpy()[:, None, :]
    else:
        want = out.hidden_states[layer_idx].numpy()
    got = ee.HFCLIPTextEncoder(cfg, layer=layer, layer_idx=layer_idx).apply(
        params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_class_embedder_ucg():
    m = ee.ClassEmbedder(embed_dim=8, n_classes=10, ucg_rate=0.5)
    labels = jnp.arange(6) % 9
    params = m.init(jax.random.PRNGKey(0), labels, disable_dropout=True)
    clean = m.apply(params, labels, disable_dropout=True)
    assert clean.shape == (6, 1, 8)
    # with dropout, each row is either its class row or the ucg row (9)
    table = params["params"]["embedding"]
    dropped = m.apply(params, labels, key=jax.random.PRNGKey(7))
    ucg_row = np.asarray(table[9])
    n_ucg = 0
    for i, lab in enumerate(np.asarray(labels)):
        row = np.asarray(dropped[i, 0])
        is_own = np.allclose(row, np.asarray(table[lab]))
        is_ucg = np.allclose(row, ucg_row)
        assert is_own or is_ucg
        n_ucg += int(is_ucg and lab != 9)
    assert 1 <= n_ucg <= 5  # ucg_rate 0.5 actually flips some rows
    # unconditional batch helper targets the reserved class
    uc = m.apply(params, m.unconditional_labels(3), disable_dropout=True)
    np.testing.assert_allclose(np.asarray(uc[0, 0]), ucg_row, rtol=1e-6)


def test_pooled_clip_image_encoder():
    from open_pandora_tpu.core.config import CLIPVisionConfig

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=2,
                           heads=4)
    m = ee.PooledCLIPImageEncoder(cfg, output_dim=16, ucg_rate=0.4)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (3, 28, 28, 3)) * 2 - 1
    params = m.init(jax.random.PRNGKey(1), imgs, no_dropout=True)
    out = m.apply(params, imgs, no_dropout=True)
    assert out.shape == (3, 16) and bool(jnp.isfinite(out).all())
    # ucg zeroes whole samples
    zs = []
    for s in range(8):
        o = m.apply(params, imgs, key=jax.random.PRNGKey(s))
        for i in range(3):
            row = np.asarray(o[i])
            assert np.allclose(row, 0) or np.allclose(row, np.asarray(out[i]))
            zs.append(np.allclose(row, 0))
    assert any(zs) and not all(zs)


def test_clip_t5_pair():
    ccfg = CLIPTextConfig(vocab_size=50, width=16, layers=1, heads=2,
                          context_length=8, penultimate=False)
    tcfg = T5Config(vocab_size=50, d_model=16, d_kv=8, d_ff=32, num_layers=1,
                    num_heads=2, relative_buckets=8, relative_max_distance=16)
    m = ee.CLIPT5Pair(ccfg, tcfg)
    ids = jnp.ones((2, 8), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids, ids)
    a, b = m.apply(params, ids, ids)
    assert a.shape == (2, 8, 16) and b.shape == (2, 8, 16)
