"""Weight-converter tests: numeric parity against the actual HF torch
implementations (LLaMA, CLIPVision, Blip2QFormer) the reference uses, plus
transform unit tests and tree-structure checks."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_pandora_tpu.core import convert as C  # noqa: E402


def test_linear_transform_parity():
    lin = torch.nn.Linear(6, 4)
    flat = {k: v.detach().numpy() for k, v in lin.state_dict().items()}
    p = C.linear({"x.weight": flat["weight"], "x.bias": flat["bias"]}, "x")
    x = np.random.RandomState(0).randn(2, 6).astype(np.float32)
    ref = lin(torch.from_numpy(x)).detach().numpy()
    out = x @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv2d_transform_parity():
    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    flat = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    p = C.conv2d(flat, "c")
    x = np.random.RandomState(0).randn(1, 3, 8, 8).astype(np.float32)
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    import flax.linen as fnn
    mod = fnn.Conv(5, (3, 3), padding=1)
    out = mod.apply({"params": {"kernel": jnp.asarray(p["kernel"]),
                                "bias": jnp.asarray(p["bias"])}},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_conv3d_transform_parity():
    conv = torch.nn.Conv3d(4, 4, (3, 1, 1), padding=(1, 0, 0))
    flat = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    p = C.conv3d(flat, "c")
    x = np.random.RandomState(0).randn(1, 4, 6, 5, 5).astype(np.float32)
    # torch NCDHW -> flax NDHWC
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 4, 1)
    import flax.linen as fnn
    mod = fnn.Conv(4, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)))
    out = mod.apply({"params": {"kernel": jnp.asarray(p["kernel"]),
                                "bias": jnp.asarray(p["bias"])}},
                    jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


# ---------------------------------------------------------------------------
# HF numeric parity
# ---------------------------------------------------------------------------


def test_llama_parity_with_hf():
    from transformers import LlamaConfig, LlamaForCausalLM as HFLlama
    from open_pandora_tpu.core.config import LLaMAConfig
    from open_pandora_tpu.models.llama import LlamaForCausalLM

    hf_cfg = LlamaConfig(vocab_size=32003, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=2, num_key_value_heads=2,
                         max_position_embeddings=128, rms_norm_eps=1e-6,
                         attention_bias=False, rope_theta=10000.0)
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval()
    flat = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = C.convert_llama(flat, 2, prefix="model")

    cfg = LLaMAConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                      num_heads=2)
    model = LlamaForCausalLM(cfg)
    ids = np.random.RandomState(0).randint(0, 32000, (1, 9))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    out = model.apply(jax.tree_util.tree_map(jnp.asarray, params),
                      jnp.asarray(ids, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_clip_tower_parity_with_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    from open_pandora_tpu.core.config import CLIPTowerConfig
    from open_pandora_tpu.models.clip_tower import CLIPVisionTower

    hf_cfg = CLIPVisionConfig(hidden_size=64, intermediate_size=256,
                              num_hidden_layers=3, num_attention_heads=2,
                              image_size=28, patch_size=14,
                              hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    flat = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    # layers run for select_layer=-2: 3 + 1 - 2 = 2
    params = C.convert_clip_tower(flat, 2, prefix="vision_model")

    cfg = CLIPTowerConfig(image_size=28, patch_size=14, width=64, layers=3,
                          heads=2, select_layer=-2)
    tower = CLIPVisionTower(cfg)
    x = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        hs = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                output_hidden_states=True).hidden_states
    ref = hs[-2][:, 1:].numpy()  # select -2, drop CLS
    out = tower.apply(jax.tree_util.tree_map(jnp.asarray, params),
                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_qformer_parity_with_hf():
    from transformers import Blip2QFormerConfig, Blip2QFormerModel
    from open_pandora_tpu.core.config import QFormerConfig
    from open_pandora_tpu.models.connector import QFormer

    hf_cfg = Blip2QFormerConfig(hidden_size=32, num_hidden_layers=2,
                                num_attention_heads=2, intermediate_size=64,
                                cross_attention_frequency=2,
                                encoder_hidden_size=32)
    torch.manual_seed(0)
    hf = Blip2QFormerModel(hf_cfg).eval()
    flat = {f"qf.{k}": v.detach().float().numpy()
            for k, v in hf.state_dict().items()}
    params = C.convert_qformer(flat, 2, cross_freq=2, prefix="qf")

    cfg = QFormerConfig(hidden_size=32, num_layers=2, num_heads=2,
                        intermediate_size=64, cross_attention_frequency=2,
                        num_query_tokens=5)
    qf = QFormer(cfg)
    q = np.random.RandomState(0).randn(2, 5, 32).astype(np.float32)
    enc = np.random.RandomState(1).randn(2, 7, 32).astype(np.float32)
    with torch.no_grad():
        ref = hf(query_embeds=torch.from_numpy(q),
                 encoder_hidden_states=torch.from_numpy(enc)
                 ).last_hidden_state.numpy()
    out = qf.apply(jax.tree_util.tree_map(jnp.asarray, params),
                   jnp.asarray(q), jnp.asarray(enc))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


# ---------------------------------------------------------------------------
# dialect normalization
# ---------------------------------------------------------------------------


def test_normalize_state_dict_dialects():
    a = np.zeros(2)
    pl = {"state_dict": {"_forward_module.model.x": a,
                         "model.framestride_embed.0.weight": a}}
    out = C.normalize_state_dict(pl["state_dict"])
    assert "model.x" in out
    assert "model.fps_embedding.0.weight" in out
    ds = {"module": {"_forward_module.y": a}}
    assert "y" in C.normalize_state_dict(ds)
