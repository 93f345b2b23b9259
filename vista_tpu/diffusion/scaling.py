"""EDM-family denoiser preconditioning scalings as pure functions.

Each scaling maps a noise level ``sigma`` to the four preconditioning
coefficients ``(c_skip, c_out, c_in, c_noise)`` of Karras et al. (EDM), such
that the denoiser output is ``net(x * c_in, c_noise) * c_out + x * c_skip``.

Behavioral counterpart of the reference's
``vwm/modules/diffusionmodules/denoiser_scaling.py:15-59``; the shipped Vista
config uses ``VScalingWithEDMcNoise`` (configs/inference/vista.yaml:16), i.e.
v-prediction coefficients with ``c_noise = 0.25 * log(sigma)``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

Array = jnp.ndarray
ScalingFn = Callable[[Array], Tuple[Array, Array, Array, Array]]
DenoiserScaling = ScalingFn  # alias for typing clarity


def edm_scaling(sigma: Array, sigma_data: float = 0.5) -> Tuple[Array, Array, Array, Array]:
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2)
    c_in = 1.0 / jnp.sqrt(sigma**2 + sigma_data**2)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


def eps_scaling(sigma: Array) -> Tuple[Array, Array, Array, Array]:
    c_skip = jnp.ones_like(sigma)
    c_out = -sigma
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def v_scaling(sigma: Array) -> Tuple[Array, Array, Array, Array]:
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def v_scaling_edm_cnoise(sigma: Array) -> Tuple[Array, Array, Array, Array]:
    """v-prediction coefficients with the EDM noise conditioning (shipped Vista)."""
    c_skip, c_out, c_in, _ = v_scaling(sigma)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


_SCALINGS = {
    "edm": edm_scaling,
    "eps": eps_scaling,
    "v": v_scaling,
    "v_edm_cnoise": v_scaling_edm_cnoise,
}


def get_scaling(name: str) -> ScalingFn:
    try:
        return _SCALINGS[name]
    except KeyError:
        raise ValueError(f"unknown scaling {name!r}; one of {sorted(_SCALINGS)}") from None
