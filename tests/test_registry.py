"""The target-grammar registry must resolve every dotted target the
reference's shipped yaml tree names (configs/inference_512_v1.0.yaml and
the condition.py encoder set) to a real constructor here."""

import jax.numpy as jnp
import pytest

from open_pandora_tpu.core import registry


SHIPPED_YAML_TARGETS = [
    "lvdm.models.ddpm3d.LatentVisualDiffusion",
    "lvdm.modules.networks.openaimodel3d.UNetModel",
    "lvdm.models.autoencoder.AutoencoderKL",
    "torch.nn.Identity",
    "lvdm.modules.encoders.condition.FrozenOpenCLIPEmbedder",
    "lvdm.modules.encoders.condition.FrozenOpenCLIPImageEmbedderV2",
    "lvdm.modules.encoders.resampler.Resampler",
]


@pytest.mark.parametrize("target", SHIPPED_YAML_TARGETS)
def test_shipped_yaml_targets_resolve(target):
    assert callable(registry.resolve_target(target))


def test_all_condition_encoders_resolve():
    for name in ("FrozenT5Embedder", "FrozenCLIPEmbedder", "ClassEmbedder",
                 "ClipImageEmbedder", "FrozenCLIPT5Encoder",
                 "IdentityEncoder"):
        assert callable(registry.resolve_target(
            f"lvdm.modules.encoders.condition.{name}"))


def test_unknown_target_raises_with_listing():
    with pytest.raises(KeyError, match="unknown reference target"):
        registry.resolve_target("lvdm.nothing.Missing")


def test_build_from_target_constructs():
    from open_pandora_tpu.core.config import UNet3DConfig
    from open_pandora_tpu.models.unet3d import UNetModel

    node = {"target": "lvdm.modules.networks.openaimodel3d.UNetModel"}
    m = registry.build_from_target(node, cfg=UNet3DConfig(), dtype=jnp.bfloat16)
    assert isinstance(m, UNetModel)
    ident = registry.build_from_target({"target": "torch.nn.Identity"})
    assert ident is None  # identity of nothing
    assert registry.build_from_target({"target": "torch.nn.Identity"},
                                      x=42) == 42
