"""EVA-ViT-g tower (reference eva_vit.py / eva_encoder.py) on a tiny
config, including cross-implementation parity vs the reference torch code
(which imports in this environment when timm is present)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import CLIPTowerConfig
from open_pandora_tpu.models.eva_tower import EVAVisionTower

pytestmark = pytest.mark.slow

TINY = CLIPTowerConfig(image_size=28, patch_size=14, width=64, layers=3,
                       heads=2, select_layer=-2, tower_type="eva_vit_g",
                       mlp_ratio=4.0)


def test_eva_tower_shapes_and_select_layer():
    tower = EVAVisionTower(TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 28, 28, 3))
    params = tower.init(jax.random.PRNGKey(1), x)
    out = tower.apply(params, x)
    assert out.shape == (2, 4, 64)  # 2x2 patches, cls dropped
    assert bool(jnp.isfinite(out).all())
    # select_layer -1 (last block) differs from -2
    last = EVAVisionTower(dataclasses.replace(TINY, select_layer=-1))
    out_last = last.apply(params, x)
    assert not np.allclose(np.asarray(out), np.asarray(out_last))


def test_eva_k_bias_is_zero_by_construction():
    tower = EVAVisionTower(TINY)
    x = jnp.zeros((1, 28, 28, 3))
    params = tower.init(jax.random.PRNGKey(0), x)
    blk = params["params"]["blocks_0"]
    assert "q_bias" in blk and "v_bias" in blk
    assert "k_bias" not in blk  # hard-zero like eva_vit.py:124


def test_worldmodel_tower_dispatch():
    from open_pandora_tpu.models.world_model import WorldModel
    from open_pandora_tpu.models.eva_tower import EVAVisionTower as EVA
    from tests.test_llm_stack import tiny_wm_cfg

    cfg = tiny_wm_cfg()
    cfg = dataclasses.replace(cfg, clip_tower=dataclasses.replace(
        cfg.clip_tower, tower_type="eva_vit_g"))
    wm = WorldModel(cfg)
    assert isinstance(wm.clip_tower, EVA)


def test_eva_parity_vs_reference_torch():
    """Random-init the reference EVA Attention+Block at a tiny shape, port
    the weights, compare activations (fp32)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from ChatUniVi.model.multimodal_encoder.eva_vit import Block
    except Exception as e:  # pragma: no cover - timm absent
        pytest.skip(f"reference eva_vit unavailable: {e}")

    dim, heads = 64, 2
    blk = Block(dim=dim, num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
                norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6))
    blk.eval()
    sd = {k: v.detach().numpy() for k, v in blk.state_dict().items()}

    ours = EVABlock = __import__(
        "open_pandora_tpu.models.eva_tower", fromlist=["EVABlock"]).EVABlock
    mod = EVABlock(heads=heads, mlp_hidden=int(dim * 4.0))
    x = np.random.RandomState(0).randn(2, 6, dim).astype(np.float32)
    params = {"params": {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "qkv_kernel": sd["attn.qkv.weight"].T,
        "q_bias": sd["attn.q_bias"],
        "v_bias": sd["attn.v_bias"],
        "proj": {"kernel": sd["attn.proj.weight"].T,
                 "bias": sd["attn.proj.bias"]},
        "mlp_fc1": {"kernel": sd["mlp.fc1.weight"].T,
                    "bias": sd["mlp.fc1.bias"]},
        "mlp_fc2": {"kernel": sd["mlp.fc2.weight"].T,
                    "bias": sd["mlp.fc2.bias"]},
    }}
    ref = blk(torch.from_numpy(x)).detach().numpy()
    out = np.asarray(mod.apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
