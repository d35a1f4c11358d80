"""Host->device input pipeline utilities.

- :func:`device_prefetch` keeps N batches in flight on device so the
  host-side batch assembly overlaps device compute (the TPU analogue of
  DataLoader ``prefetch_factor``, ViT_dataloader.py:74-87).
- :func:`host_shard` slices each batch down to this process's share for
  multi-host training (each host feeds its own chips; the mesh's data
  axis stitches the global batch together).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax


def device_prefetch(
    loader: Iterable[dict], *, size: int = 2, sharding=None
) -> Iterator[dict]:
    """Asynchronously stage ``size`` batches ahead on device."""

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    queue: collections.deque = collections.deque()
    it = iter(loader)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def host_shard(
    batch: dict, *, process_index: int | None = None, process_count: int | None = None
) -> dict:
    """Slice the global batch to this host's contiguous shard."""
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    if pc == 1:
        return batch

    def slc(x):
        n = x.shape[0]
        if n % pc:
            raise ValueError(f"batch {n} not divisible by process count {pc}")
        per = n // pc
        return x[pi * per : (pi + 1) * per]

    return jax.tree.map(slc, batch)


def as_device_batches(
    loader: Iterable[dict], *, mesh=None, mesh_cfg=None, prefetch: int = 2
) -> Iterator[dict]:
    """Loader -> device batches, sharded over the mesh's data axis when a
    mesh is given."""
    sharding = None
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh, mesh_cfg)
    yield from device_prefetch(loader, size=prefetch, sharding=sharding)
