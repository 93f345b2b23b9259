"""Sequence-parallel spatial attention over a mesh axis.

The optional scaling extension sketched in SURVEY.md §5.7: the spatial token
axis (up to 9216 tokens at 576x1024 — 370x longer than the temporal axis) is
the natural axis to shard when one chip's HBM or latency budget is exceeded.

Pattern (scaling-book style): shard Q/K/V on the sequence axis over the
``sp`` mesh axis; all-gather K and V over ICI (they're small relative to the
O(S^2) attention work); each chip computes full attention for its local
query shard. Collectives ride ICI; XLA overlaps the gather with the first
matmul blocks.

This is exact (no approximation) and composes with the Pallas flash kernel:
each shard's local attention uses the same single-chip kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vista_tpu.ops.attention import dot_product_attention

Array = jnp.ndarray


def sp_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "sp",
    backend: str = "xla",
) -> Array:
    """(B, S, H, D) attention with the S axis sharded over ``mesh[axis]``.

    Inputs may be globally-shaped arrays (sharded or not); the output carries
    the same sequence sharding as the query.
    """

    def local_attn(q_shard: Array, k_shard: Array, v_shard: Array) -> Array:
        from vista_tpu.parallel.kernel_sharding import suspend

        # gather the full key/value sequence over ICI; queries stay local
        k_full = jax.lax.all_gather(k_shard, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_shard, axis, axis=1, tiled=True)
        with suspend():  # this body IS the island; don't nest kernel islands
            return dot_product_attention(q_shard, k_full, v_full, backend=backend)

    spec = P(None, axis, None, None)
    return jax.shard_map(
        local_attn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
