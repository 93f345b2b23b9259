"""Device mesh construction and sharding rules.

Replaces the reference's entire distribution stack — torchrun + NCCL +
Lightning DDP + DeepSpeed ZeRO-2 (SURVEY.md §2.8) — with JAX SPMD:

- ``data`` axis: batch (videos) sharded; gradients all-reduce over ICI —
  the DDP counterpart;
- ``fsdp`` axis: parameters and optimizer state sharded over their largest
  divisible dimension; XLA inserts all-gathers for weights (forward/backward)
  and reduce-scatters for gradients — the ZeRO-2/3 counterpart (the
  reference's per-rank partitioned checkpoints + offline ``zero_to_fp32.py``
  merge disappear: Orbax reads/writes the sharded state directly).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` (one
process per host; the counterpart of torchrun's process-group setup,
train.py:728-741).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(
    axis_sizes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; default is pure data parallelism over all devices.

    axis_sizes: e.g. ``{"data": 4, "fsdp": 2}``; a single ``-1`` entry is
    inferred from the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"data": n}
    sizes = dict(axis_sizes)
    unknown = [k for k, v in sizes.items() if v == -1]
    if len(unknown) > 1:
        raise ValueError("at most one -1 axis")
    known = int(np.prod([v for v in sizes.values() if v != -1]))
    if unknown:
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[unknown[0]] = n // known
    total = int(np.prod(list(sizes.values())))
    if total != n:
        raise ValueError(f"mesh {sizes} needs {total} devices, have {n}")
    dev_array = np.asarray(devices).reshape(*sizes.values())
    return Mesh(dev_array, tuple(sizes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for data batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_specs(params, mesh: Mesh, axis: str = "fsdp", min_size: int = 2**16):
    """Per-leaf PartitionSpec: shard the largest ``axis``-divisible dim.

    Small leaves (biases, norm scales, < min_size elements) stay replicated —
    sharding them costs more in collective latency than it saves in memory.
    """
    if axis not in mesh.axis_names:
        return jax.tree.map(lambda _: P(), params)
    n_shard = mesh.shape[axis]

    def spec(leaf):
        if leaf.size < min_size:
            return P()
        dims = list(leaf.shape)
        candidates = [(d, i) for i, d in enumerate(dims) if d % n_shard == 0]
        if not candidates:
            return P()
        _, best = max(candidates)
        out = [None] * len(dims)
        out[best] = axis
        return P(*out)

    return jax.tree.map(spec, params)


def shard_pytree(tree, mesh: Mesh, specs=None):
    """Device-put a pytree with the given (or fsdp-derived) specs."""
    if specs is None:
        specs = fsdp_param_specs(tree, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )
