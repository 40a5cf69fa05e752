"""Tensor-parallel LLaMA: sharded forward equals replicated forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.core.config import MeshConfig
from open_pandora_tpu.models.llama import LlamaForCausalLM
from open_pandora_tpu.parallel.mesh import build_mesh
from open_pandora_tpu.parallel.tp import (llama_param_shardings,
                                          shard_llama_params)
from tests.test_llm_stack import TINY_LLAMA

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


@pytest.fixture(scope="module")
def mesh24(cpu_devices):
    return build_mesh(MeshConfig(data_parallel=2, model_parallel=4),
                      devices=cpu_devices)


def test_tp_shardings_structure(mesh24):
    model = LlamaForCausalLM(TINY_LLAMA)
    ids = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    specs = llama_param_shardings(mesh24, params)
    p0 = specs["params"]["model"]["layers_0"]
    assert p0["self_attn"]["q_proj"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert p0["self_attn"]["o_proj"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    assert p0["mlp"]["down_proj"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    assert specs["params"]["embed_tokens"]["embedding"].spec == jax.sharding.PartitionSpec()


def test_tp_forward_matches_replicated(mesh24):
    model = LlamaForCausalLM(TINY_LLAMA)
    ids = jnp.asarray([[1, 5, 9, 2, 7, 3]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    ref = model.apply(params, ids)

    with mesh24.mesh:
        sharded = shard_llama_params(mesh24, params)
        out = jax.jit(model.apply)(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    # weights are actually distributed
    k = sharded["params"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert not k.sharding.is_fully_replicated


def test_tp_quantized_forward(mesh24):
    from open_pandora_tpu.models.quant import quantize_llama_params
    model = LlamaForCausalLM(TINY_LLAMA)
    qmodel = LlamaForCausalLM(TINY_LLAMA, quantized=True)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    qparams = jax.tree_util.tree_map(jnp.asarray, quantize_llama_params(params))
    ref = qmodel.apply(qparams, ids)
    with mesh24.mesh:
        sharded = shard_llama_params(mesh24, qparams)
        out = jax.jit(qmodel.apply)(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
