"""Device mesh + sharding layer.

Replaces the reference's NCCL/torch.distributed/DeepSpeed stack
(ddp_wrapper.py:8-12, utils/utils_train.py:123-134, config/config.yaml:22)
with pure sharding specs over a `jax.sharding.Mesh`:

  - DDP          == batch axis sharded over ('data',), grads psum'd by XLA
  - ZeRO-2       == optimizer-state pytree sharded over ('data',)
  - rank-sharded
    inference    == jax.process_index()-based prompt slicing

No backend code: XLA GSPMD inserts the ICI collectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from open_pandora_tpu.core.config import MeshConfig


@dataclass
class MeshSpec:
    mesh: Mesh
    data_axis: str
    model_axis: str

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[self.model_axis]

    def named(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))


def build_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> MeshSpec:
    """Build a ('data', 'model') mesh over all (or given) devices.

    data_parallel == -1 means "all devices / model_parallel".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    mesh = Mesh(arr, (cfg.data_axis, cfg.model_axis))
    return MeshSpec(mesh=mesh, data_axis=cfg.data_axis, model_axis=cfg.model_axis)


def replicated(ms: MeshSpec) -> NamedSharding:
    return ms.named()


def data_sharding(ms: MeshSpec, ndim: int, batch_dim: int = 0) -> NamedSharding:
    """Shard `batch_dim` over the data axis, replicate the rest."""
    spec = [None] * ndim
    spec[batch_dim] = ms.data_axis
    return ms.named(*spec)


def shard_batch(ms: MeshSpec, batch):
    """Device-put a host batch pytree with leading dim sharded over data."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(ms, np.ndim(x))), batch
    )


# ---------------------------------------------------------------------------
# ZeRO-2 as sharding specs
# ---------------------------------------------------------------------------


def _shardable_axis(shape: tuple, n_shard: int) -> Optional[int]:
    """Pick the largest axis divisible by n_shard (None if no such axis or
    the tensor is too small to be worth sharding)."""
    best = None
    for i, d in enumerate(shape):
        if d % n_shard == 0 and d >= n_shard:
            if best is None or d > shape[best]:
                best = i
    return best


def zero2_param_spec(ms: MeshSpec, params) -> "jax.tree_util.PyTreeDef":
    """Replicated parameter shardings (ZeRO-2 keeps full params per rank;
    only grads/opt-state are sharded — DeepSpeed stage-2 semantics,
    reference config/config.yaml:22)."""
    return jax.tree_util.tree_map(lambda x: replicated(ms), params)


def zero2_opt_spec(ms: MeshSpec, opt_state, min_size: int = 2 ** 16):
    """Shard every large optimizer-state leaf over the data axis.

    Equivalent to DeepSpeed ZeRO stage-2 optimizer partitioning
    (utils_train.py:125, pt2bin.py:5-16) expressed as a sharding spec.
    Leaves whose shapes don't divide, or that are tiny (step counters),
    stay replicated.
    """
    n = ms.n_data

    def leaf_spec(x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 1
        if size < min_size:
            return replicated(ms)
        ax = _shardable_axis(tuple(shape), n)
        if ax is None:
            return replicated(ms)
        spec = [None] * len(shape)
        spec[ax] = ms.data_axis
        return ms.named(*spec)

    return jax.tree_util.tree_map(leaf_spec, opt_state)


def fsdp_param_spec(ms: MeshSpec, params, min_size: int = 2 ** 16):
    """FSDP / ZeRO-3 analog as sharding specs: every large parameter leaf
    sharded over the data axis. GSPMD inserts the all-gathers at use sites
    (forward AND backward re-gather) and reduce-scatters the gradients, so
    per-chip param memory drops ~n_data-fold — the TPU-native equivalent of
    the reference's FSDP-wrapped LLM training (ChatUniVi/train/train.py:974
    fsdp + transformer_layer_cls wrap policy). Tiny leaves (norm scales,
    biases) stay replicated, like FSDP's min_num_params threshold."""
    n = ms.n_data

    def leaf_spec(x):
        shape = tuple(getattr(x, "shape", ()))
        size = int(np.prod(shape)) if shape else 1
        ax = _shardable_axis(shape, n)
        if size < min_size or ax is None:
            return replicated(ms)
        spec = [None] * len(shape)
        spec[ax] = ms.data_axis
        return ms.named(*spec)

    return jax.tree_util.tree_map(leaf_spec, params)


def process_shard_indices(n_items: int) -> range:
    """Per-host slice of a work list (reference: inference.py:276-282
    rank-sharded prompt lists)."""
    rank = jax.process_index()
    world = jax.process_count()
    per = -(-n_items // world)
    return range(rank * per, min((rank + 1) * per, n_items))
