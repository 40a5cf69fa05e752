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


def test_quantize_kernel_nf4_roundtrip():
    from open_pandora_tpu.models.quant import (NF4_CODE, dequantize_kernel_nf4,
                                               quantize_kernel_nf4)
    w = np.random.RandomState(1).randn(128, 16).astype(np.float32) * 0.05
    q = quantize_kernel_nf4(w)
    assert q["kernel_p"].dtype == np.uint8
    assert q["kernel_p"].shape == (64, 16)
    assert q["absmax"].shape == (2, 16)
    deq = np.asarray(dequantize_kernel_nf4(
        jnp.asarray(q["kernel_p"]), jnp.asarray(q["absmax"]),
        dtype=jnp.float32))
    # nearest-codebook quantization: error <= absmax * (max adjacent
    # codebook gap)/2 per block
    half_gap = np.max(np.diff(NF4_CODE)) / 2
    bound = np.repeat(q["absmax"], 64, axis=0) * half_gap + 1e-6
    assert (np.abs(deq - w) <= bound).all()


def test_nf4_model_close_to_fp():
    from open_pandora_tpu.models.quant import tree_nbytes
    model = LlamaForCausalLM(TINY_LLAMA)
    qmodel = LlamaForCausalLM(TINY_LLAMA, quantized="nf4")
    ids = jnp.asarray([[1, 7, 3, 9, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    qparams = jax.tree_util.tree_map(
        jnp.asarray, quantize_llama_params(params, mode="nf4"))

    ref_struct = jax.tree_util.tree_structure(
        qmodel.init(jax.random.PRNGKey(0), ids))
    assert jax.tree_util.tree_structure(qparams) == ref_struct

    # wiring contract: the quantized module must equal the full-precision
    # model run on explicitly-dequantized kernels (nf4's intrinsic ~10%
    # per-matmul error on tiny fan-in gaussian weights is a property of
    # the format, not of this implementation — so quality is asserted
    # only loosely, exactness is asserted against the dequant path)
    from open_pandora_tpu.models.quant import dequantize_kernel_nf4

    def dequant_tree(fp, q):
        if isinstance(q, dict) and "kernel_p" in q:
            return {"kernel": dequantize_kernel_nf4(
                jnp.asarray(q["kernel_p"]), jnp.asarray(q["absmax"]),
                dtype=jnp.float32)}
        if isinstance(q, dict):
            return {k: dequant_tree(fp[k], q[k]) for k in q}
        return fp

    dparams = dequant_tree(params, qparams)
    h_deq = model.apply(dparams, ids)
    h_q = qmodel.apply(qparams, ids)
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_deq),
                               atol=2e-5, rtol=2e-4)
    h_fp = model.apply(params, ids)
    scale = float(jnp.abs(h_fp).max())
    assert float(jnp.abs(h_fp - h_q).max()) / scale < 0.5  # sanity only

    # 4-bit + blockwise scales: well under half the int8 tree
    q8 = quantize_llama_params(params)
    proj8 = sum(v["kernel_q"].size for k, v in
                _iter_proj(q8["params"]))
    proj4 = sum(v["kernel_p"].size for k, v in
                _iter_proj(qparams["params"], key="kernel_p"))
    assert proj4 * 2 == proj8  # two codes per byte over the same elements
    lm = qparams["params"]["lm_head"]
    assert lm["kernel_p"].dtype == jnp.uint8


def _iter_proj(tree, key="kernel_q", path=""):
    if isinstance(tree, dict):
        if key in tree:
            yield path, tree
        else:
            for k, v in tree.items():
                yield from _iter_proj(v, key, path + "/" + k)


def test_nf4_generate_path():
    """greedy_generate's raw-params _dense must handle the nf4 layout."""
    from open_pandora_tpu.models.llama_generate import greedy_generate
    model = LlamaForCausalLM(TINY_LLAMA)
    qmodel = LlamaForCausalLM(TINY_LLAMA, quantized="nf4")
    ids = jnp.asarray([[1, 5, 9, 4]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    qparams = jax.tree_util.tree_map(
        jnp.asarray, quantize_llama_params(params, mode="nf4"))
    embeds = model.apply(params, ids, method=LlamaForCausalLM.embed)
    out = greedy_generate(qmodel, qparams, embeds, max_new_tokens=3)
    assert out.shape == (1, 3)
    assert bool((out >= 0).all())
