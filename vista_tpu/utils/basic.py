"""Small shape/pytree helpers shared across the framework.

Counterpart of the reference's ``vwm/util.py`` helpers (append_dims,
expand_dims_like, repeat_as_img_seq) re-expressed for JAX arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Append trailing singleton dims until ``x.ndim == target_ndim``."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}, which is less")
    return x[(...,) + (None,) * dims_to_append]


def expand_dims_like(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Append trailing singleton dims to ``x`` until it has ``y``'s rank."""
    return append_dims(x, y.ndim)


def repeat_as_img_seq(x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """Tile a per-video tensor ``(b, ...)`` to per-frame ``(b*t, ...)``.

    Matches the reference semantics (vwm/util.py repeat_as_img_seq): each
    video's entry is repeated ``num_frames`` times contiguously, i.e.
    ``out[b*t + i] == x[b]``.
    """
    return jnp.repeat(x, num_frames, axis=0)
