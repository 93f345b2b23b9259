"""Ensemble-variance reward estimation.

Behavioral counterpart of ``reward_utils.py:284-341``: generate an ensemble
of rollouts from the same condition, compute the per-latent variance across
the ensemble, and return ``reward = exp(-variance.mean())`` — higher means
the model is more confident under the given action conditioning. No decode
is needed; the reward lives entirely in latent space.

TPU-first: the ensemble is a ``lax.map`` over fold-in PRNG keys (one
compiled sampling program, sequential to bound memory); variance is a single
fused reduction. Swap ``lax.map`` for ``vmap``/device sharding when chips
are available per ensemble member (the task is embarrassingly parallel).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, Optional, Tuple

import jax
import jax.numpy as jnp

from vista_tpu.diffusion.sampler import SamplerConfig
from vista_tpu.engine.engine import VistaEngine

Array = jnp.ndarray


def estimate_reward(
    engine: VistaEngine,
    params: Dict,
    images: Array,
    batch: Dict[str, Array],
    sampler: SamplerConfig,
    ensemble_size: int = 5,
    initial_cond_indices: Tuple[int, ...] = (0,),
    force_uc_zero: FrozenSet[str] = frozenset(
        {"cond_frames", "cond_frames_without_noise",
         "command", "trajectory", "speed", "angle", "goal"}),
    key: Optional[jax.Array] = None,
) -> Array:
    """Scalar confidence reward for the given context + action conditioning."""
    cfg = engine.cfg
    t = cfg.num_frames
    key = key if key is not None else jax.random.key(0)
    k_enc, k_aug, k_ens = jax.random.split(key, 3)

    z = engine.jit_encode()(params, images, k_enc)

    b = dict(batch)
    b["cond_frames_without_noise"] = images[:1]
    cond_aug = batch.get("cond_aug", jnp.zeros((1,)))
    b["cond_frames"] = images[:1] + cond_aug[0] * jax.random.normal(
        k_aug, images[:1].shape, dtype=images.dtype)
    c, uc = engine.jit_condition_pair(force_uc_zero)(params, b)

    mask = jnp.zeros((t,), dtype=jnp.float32).at[
        jnp.asarray(initial_cond_indices, dtype=jnp.int32)].set(1.0)

    def run_ensemble(params, z, c, uc, mask, k_ens):
        def one_member(i):
            noise = jax.random.normal(jax.random.fold_in(k_ens, i), z.shape, dtype=z.dtype)
            s = engine.sample(params, noise, c, uc, cond_frame=z, cond_mask=mask,
                              sampler=sampler)
            return s.at[0].set(z[0])

        ensemble = jax.lax.map(one_member, jnp.arange(ensemble_size))
        variance = jnp.var(ensemble, axis=0, ddof=1)
        return jnp.exp(-variance.mean())

    run_j = engine._cached(("reward", sampler, ensemble_size),
                           lambda: jax.jit(run_ensemble))
    return run_j(params, z, c, uc, mask, k_ens)
