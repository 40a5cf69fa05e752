import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from open_pandora_tpu.core.config import MeshConfig
from open_pandora_tpu.parallel.mesh import (
    build_mesh,
    data_sharding,
    shard_batch,
    zero2_opt_spec,
)

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host


def test_mesh_has_8_devices(mesh8):
    assert mesh8.n_data == 8
    assert mesh8.n_model == 1


def test_mesh_2d(cpu_devices):
    ms = build_mesh(MeshConfig(model_parallel=2), devices=cpu_devices)
    assert ms.n_data == 4 and ms.n_model == 2


def test_shard_batch(mesh8):
    batch = {"x": np.ones((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
    sharded = shard_batch(mesh8, batch)
    shardings = sharded["x"].sharding
    assert shardings == data_sharding(mesh8, 2)
    # each device holds 2 rows
    assert sharded["x"].addressable_shards[0].data.shape == (2, 4)


def test_zero2_opt_state_sharded(mesh8):
    params = {"w": jnp.ones((1024, 256)), "b": jnp.ones((8,))}
    opt = optax.adam(1e-3)
    state = opt.init(params)
    specs = zero2_opt_spec(mesh8, state, min_size=1024)
    # the adam mu for 'w' must be sharded over data, 'b' replicated
    mu = state[0].mu
    mu_specs = specs[0].mu
    assert mesh8.data_axis in str(mu_specs["w"].spec)
    assert mu_specs["b"].spec == jax.sharding.PartitionSpec()
    # placing state under the spec works and shards bytes 8-ways
    placed = jax.device_put(state, specs)
    shard0 = placed[0].mu["w"].addressable_shards[0].data
    assert shard0.shape in ((128, 256), (1024, 32))


def test_dp_psum_gradient(mesh8):
    """DDP semantics: per-device grads psum to the global mean under jit."""
    from jax.sharding import PartitionSpec as P

    w = jnp.ones((4,))
    xs = jnp.arange(16, dtype=jnp.float32).reshape(16, 1) * jnp.ones((16, 4))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    gfn = jax.jit(
        jax.grad(loss),
        in_shardings=(mesh8.named(), data_sharding(mesh8, 2)),
        out_shardings=mesh8.named(),
    )
    g = gfn(w, xs)
    g_ref = jax.grad(loss)(w, xs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-6)
