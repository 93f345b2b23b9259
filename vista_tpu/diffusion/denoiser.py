"""EDM denoiser preconditioning as a pure function.

Counterpart of ``vwm/modules/diffusionmodules/denoiser.py:22-35``: scale the
network input by ``c_in``, condition on ``c_noise``, and combine the network
output as ``net(...) * c_out + x * c_skip``. The conditional-frame mask is
threaded to the network (which blends two time-embedding MLPs with it).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from vista_tpu.diffusion.scaling import ScalingFn, v_scaling_edm_cnoise
from vista_tpu.utils.basic import append_dims

Array = jnp.ndarray

# network_fn(scaled_input, c_noise, cond, cond_mask) -> prediction
NetworkFn = Callable[[Array, Array, dict, Optional[Array]], Array]


def precondition_denoise(
    network_fn: NetworkFn,
    noised_input: Array,
    sigma: Array,
    cond: dict,
    cond_mask: Optional[Array] = None,
    scaling: ScalingFn = v_scaling_edm_cnoise,
) -> Array:
    """Run the network under EDM preconditioning; returns the denoised estimate.

    noised_input: ``(b*t, h, w, c)`` latents.
    sigma: ``(b*t,)`` noise levels (already per-frame).
    """
    sigma_b = append_dims(sigma.astype(jnp.float32), noised_input.ndim)
    c_skip, c_out, c_in, c_noise = scaling(sigma_b)
    c_noise = c_noise.reshape(sigma.shape)
    out = network_fn(noised_input * c_in, c_noise, cond, cond_mask)
    return out.astype(jnp.float32) * c_out + noised_input * c_skip


def sigma_to_idx(sigma: Array, sigma_table: Array) -> Array:
    """Index of the nearest table entry (denoiser.py:55-57)."""
    dists = jnp.abs(sigma[..., None] - sigma_table.astype(jnp.float32))
    return jnp.argmin(dists, axis=-1)


def precondition_denoise_discrete(
    network_fn: NetworkFn,
    noised_input: Array,
    sigma: Array,
    cond: dict,
    sigma_table: Array,
    cond_mask: Optional[Array] = None,
    scaling: ScalingFn = v_scaling_edm_cnoise,
    quantize_c_noise: bool = True,
) -> Array:
    """DiscreteDenoiser counterpart (denoiser.py:38-69): quantize sigma to
    the nearest entry of a discrete table (e.g. ``legacy_ddpm_sigmas(1000,
    append_zero=False)``, descending = the reference's ``flip=True``) and,
    when ``quantize_c_noise``, condition the network on the table INDEX
    instead of the continuous c_noise — the discrete-timestep conditioning
    SD-lineage checkpoints were trained with. Unused by shipped Vista
    configs but part of the reference surface (SURVEY.md §2.3)."""
    sigma = sigma.astype(jnp.float32)
    idx = sigma_to_idx(sigma, sigma_table)
    sigma_q = sigma_table.astype(jnp.float32)[idx]
    sigma_b = append_dims(sigma_q, noised_input.ndim)
    c_skip, c_out, c_in, c_noise = scaling(sigma_b)
    if quantize_c_noise:
        # re-quantize c_noise through the table (denoiser.py:66-69): for
        # identity-like c_noise scalings this is the table index
        c_noise = sigma_to_idx(c_noise.reshape(sigma.shape), sigma_table)
    else:
        c_noise = c_noise.reshape(sigma.shape)
    out = network_fn(noised_input * c_in, c_noise.astype(jnp.float32), cond, cond_mask)
    return out.astype(jnp.float32) * c_out + noised_input * c_skip
