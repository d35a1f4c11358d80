"""Device mesh + sharding rules (SPMD data parallelism, ICI collectives).

The reference's entire distributed story is single-process
``nn.DataParallel`` replication (bestengine.py:1032-1034).  The TPU-native
equivalent: a named ``jax.sharding.Mesh`` with a ``data`` axis (batch
sharding; XLA inserts the psum gradient all-reduce over ICI) and an
optional ``model`` axis that shards the stacked per-string head weights
([6, in, out] along the string dim).  Everything runs through ``jit``
with sharding annotations — no hand-written collectives in user code.

Multi-host: call :func:`maybe_initialize_distributed` first; the mesh is
then built over all global devices and per-host data loading feeds each
process its shard (see data pipeline).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def maybe_initialize_distributed() -> None:
    """jax.distributed.initialize() iff running under a multi-host launcher
    (the DCN path; single-host slices need nothing).  Must be called
    before any other JAX API touches the backend — so the check is
    env-only (querying jax.process_count() would initialize it)."""
    if "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(
            f"mesh {dp}x{mp} does not cover {n} devices; set "
            f"MeshConfig.data_parallel/model_parallel to factor {n}"
        )
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, cfg: MeshConfig | None = None) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    cfg = cfg or MeshConfig()
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_string_stacked(path: tuple, leaf: Any, num_strings: int) -> bool:
    """StackedDense / per-string BN leaves are [num_strings, ...] (ndim>=2).
    No other param family in the model zoo has a leading dim of 6, so the
    shape rule is sufficient and robust to module nesting."""
    del path
    return (
        hasattr(leaf, "shape")
        and len(leaf.shape) >= 2
        and leaf.shape[0] == num_strings
    )


def param_shardings(
    mesh: Mesh,
    tree: Any,
    cfg: MeshConfig | None = None,
    *,
    num_strings: int = 6,
) -> Any:
    """Sharding tree for a param/opt-state pytree: stacked per-string head
    weights shard along the model axis; everything else is replicated."""
    cfg = cfg or MeshConfig()
    model_size = mesh.shape[cfg.model_axis]

    def rule(path, leaf):
        if (
            model_size > 1
            and _is_string_stacked(path, leaf, num_strings)
            and num_strings % model_size == 0
        ):
            return NamedSharding(mesh, P(cfg.model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, tree)


def shard_batch(mesh: Mesh, batch: Any, cfg: MeshConfig | None = None) -> Any:
    """Place a host batch onto the mesh, sharded over the data axis."""
    sh = batch_sharding(mesh, cfg)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
