"""Sequence-parallel ring attention vs full attention on the 8-device CPU
mesh (new capability beyond the reference — SURVEY §2.7 SP row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pandora_tpu.ops.attention_xla import mha_xla
from open_pandora_tpu.parallel.sp import _merge, _attn_with_lse, ring_attention

pytestmark = pytest.mark.slow  # shard_map compile on the 1-core host


def test_merge_equals_joint_softmax():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 8, 2, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 2, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 2, 16))
    o_full, _ = _attn_with_lse(q, k, v)
    o1, l1 = _attn_with_lse(q, k[:, :5], v[:, :5])
    o2, l2 = _attn_with_lse(q, k[:, 5:], v[:, 5:])
    o_merged, _ = _merge(o1, l1, o2, l2)
    np.testing.assert_allclose(np.asarray(o_merged), np.asarray(o_full),
                               atol=1e-5, rtol=1e-5)


def test_ring_attention_matches_full(mesh8):
    B, N, H, D = 2, 64, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, N, H, D))
    k = jax.random.normal(ks[1], (B, N, H, D))
    v = jax.random.normal(ks[2], (B, N, H, D))

    out = ring_attention(q, k, v, mesh=mesh8.mesh, axis="data")
    ref = mha_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_sharded_inputs(mesh8):
    """Inputs already sharded over the sequence axis stay sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, N, H, D = 1, 32, 1, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, D))
    sh = NamedSharding(mesh8.mesh, P(None, "data", None, None))
    qs = jax.device_put(q, sh)
    out = ring_attention(qs, qs, qs, mesh=mesh8.mesh, axis="data")
    assert out.sharding.spec == P(None, "data", None, None)
    ref = mha_xla(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_rejects_indivisible(mesh8):
    q = jnp.zeros((1, 30, 1, 8))
    with pytest.raises(AssertionError, match="not divisible"):
        ring_attention(q, q, q, mesh=mesh8.mesh, axis="data")


def test_ring_attention_causal_matches_full(mesh8):
    """Causal ring (global-index mask across rotating shards) == causal
    full attention."""
    B, N, H, D = 2, 64, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, N, H, D))
    k = jax.random.normal(ks[1], (B, N, H, D))
    v = jax.random.normal(ks[2], (B, N, H, D))
    out = ring_attention(q, k, v, mesh=mesh8.mesh, axis="data", causal=True)
    ref = mha_xla(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sp_llama_prefill_matches_trunk(mesh8):
    """The wired path: LLaMA prefill with ring-sharded causal attention
    over the 8-device mesh == the single-device trunk."""
    from open_pandora_tpu.models.llama import LlamaForCausalLM
    from open_pandora_tpu.parallel.sp import sp_llama_prefill
    from tests.test_llm_stack import TINY_LLAMA

    model = LlamaForCausalLM(TINY_LLAMA)
    ids = jnp.asarray([list(range(1, 65))], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    embeds = model.apply(params, ids, method=LlamaForCausalLM.embed)

    ref = model.apply(params, embeds, method=LlamaForCausalLM.trunk)
    out = sp_llama_prefill(model, params, embeds, mesh=mesh8.mesh,
                           axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_sp_context_does_not_leak():
    """Outside the context manager attention must not ring-route."""
    from open_pandora_tpu.parallel.sp import current_sp, sp_eligible
    assert current_sp() is None
    assert not sp_eligible((1, 64, 2, 16), (1, 64, 2, 16), True, None)
