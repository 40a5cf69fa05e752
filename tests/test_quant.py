"""int8 weight-only LLaMA quantization tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from open_pandora_tpu.models.llama import LlamaForCausalLM
from open_pandora_tpu.models.quant import (quantize_kernel,
                                           quantize_llama_params, tree_nbytes)
from tests.test_llm_stack import TINY_LLAMA

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


def test_quantize_kernel_roundtrip():
    w = np.random.RandomState(0).randn(32, 16).astype(np.float32)
    q = quantize_kernel(w)
    assert q["kernel_q"].dtype == np.int8
    deq = q["kernel_q"].astype(np.float32) * q["scale"]
    # per-channel symmetric int8: worst-case error = scale/2
    assert np.abs(deq - w).max() <= q["scale"].max() / 2 + 1e-6


def test_quantized_model_close_to_fp():
    model = LlamaForCausalLM(TINY_LLAMA)
    qmodel = LlamaForCausalLM(TINY_LLAMA, quantized=True)
    ids = jnp.asarray([[1, 7, 3, 9, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    qparams = jax.tree_util.tree_map(jnp.asarray,
                                     quantize_llama_params(params))

    # structure matches the quantized module
    ref_struct = jax.tree_util.tree_structure(
        qmodel.init(jax.random.PRNGKey(0), ids))
    assert jax.tree_util.tree_structure(qparams) == ref_struct

    h_fp = model.apply(params, ids)
    h_q = qmodel.apply(qparams, ids)
    scale = float(jnp.abs(h_fp).max())
    rel = float(jnp.abs(h_fp - h_q).max()) / scale
    assert rel < 0.05, rel

    # memory: quantized tree smaller (the tiny config is dominated by the
    # un-quantized embedding; at 7B the projections dominate -> ~4x)
    assert tree_nbytes(qparams) < 0.7 * tree_nbytes(params)
    lm = qparams["params"]["lm_head"]
    assert lm["kernel_q"].dtype == jnp.int8


def test_trunk_hidden_states_close():
    model = LlamaForCausalLM(TINY_LLAMA)
    qmodel = LlamaForCausalLM(TINY_LLAMA, quantized=True)
    ids = jnp.asarray([[1, 4, 4, 8]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    qparams = jax.tree_util.tree_map(jnp.asarray,
                                     quantize_llama_params(params))
    e = model.apply(params, ids, method=LlamaForCausalLM.embed)
    h1 = model.apply(params, e, method=LlamaForCausalLM.trunk)
    h2 = qmodel.apply(qparams, e, method=LlamaForCausalLM.trunk)
    rel = float(jnp.abs(h1 - h2).max()) / float(jnp.abs(h1).max())
    assert rel < 0.05, rel
