import dataclasses

import pytest

from open_pandora_tpu.core.config import PandoraConfig, load_config


def test_defaults_match_shipped_reference_config():
    cfg = PandoraConfig()
    # inference_512_v1.0.yaml values
    assert cfg.unet.model_channels == 320
    assert cfg.unet.channel_mult == (1, 2, 4, 4)
    assert cfg.unet.in_channels == 8
    assert cfg.unet.context_dim == 1024
    assert cfg.unet.temporal_length == 16
    assert cfg.diffusion.linear_start == 0.00085
    assert cfg.diffusion.linear_end == 0.012
    assert cfg.diffusion.parameterization == "v"
    assert cfg.diffusion.rescale_betas_zero_snr
    assert cfg.vae.scale_factor == 0.18215
    # config_json.json / configuration.py values
    assert cfg.connector.image_prefix_length == 64
    assert cfg.qformer.num_query_tokens == 77
    assert cfg.qformer.cross_attention_frequency == 2
    assert cfg.connector.proj_out_dim == 1024
    assert cfg.llama.hidden_size == 4096


def test_dotted_overrides():
    cfg = load_config(overrides=["sampler.steps=10", "unet.model_channels=64",
                                 "diffusion.rescale_betas_zero_snr=false"])
    assert cfg.sampler.steps == 10
    assert cfg.unet.model_channels == 64
    assert cfg.diffusion.rescale_betas_zero_snr is False


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config(overrides=["unet.bogus_key=1"])


def test_yaml_merge(tmp_path):
    p1 = tmp_path / "a.yaml"
    p1.write_text("sampler:\n  steps: 25\nunet:\n  model_channels: 128\n")
    p2 = tmp_path / "b.yaml"
    p2.write_text("sampler:\n  steps: 30\n")
    cfg = load_config(yaml_paths=[str(p1), str(p2)])
    assert cfg.sampler.steps == 30           # right-most wins
    assert cfg.unet.model_channels == 128    # untouched by b.yaml


def test_config_frozen():
    cfg = PandoraConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.sampler.steps = 5  # type: ignore
