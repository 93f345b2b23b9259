"""Training-time sigma samplers.

Counterpart of ``vwm/modules/diffusionmodules/sigma_sampling.py``: the EDM
lognormal sampler draws one sigma per *video* and repeats it across the
video's frames (the reference's `(b) -> (b t)` repeat, sigma_sampling.py:13-19).
Shipped Vista training uses p_mean=1.0, p_std=1.6
(configs/training/vista_phase1.yaml:181-186).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_edm_sigmas(
    key: jax.Array,
    n_videos: int,
    num_frames: int = 25,
    p_mean: float = 1.0,
    p_std: float = 1.6,
) -> jnp.ndarray:
    """Lognormal sigmas, one per video, repeated per frame. Shape ``(n_videos*num_frames,)``."""
    rand = jax.random.normal(key, (n_videos,))
    log_sigma = p_mean + p_std * rand
    sigmas = jnp.exp(log_sigma)
    return jnp.repeat(sigmas, num_frames)


def sample_discrete_sigmas(
    key: jax.Array,
    sigma_table: jnp.ndarray,
    n_videos: int,
    num_frames: int = 25,
) -> jnp.ndarray:
    """Uniformly sample indices into a discrete sigma table, one per video."""
    idx = jax.random.randint(key, (n_videos,), 0, sigma_table.shape[0])
    return jnp.repeat(sigma_table[idx], num_frames)
