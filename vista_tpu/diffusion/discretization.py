"""Noise-level (sigma) schedules.

Behavioral counterpart of ``vwm/modules/diffusionmodules/discretizer.py``:
the Karras rho-schedule used by the shipped sampler (sigma in [0.002, 700],
rho=7 — sample_utils.py:153-161) and the legacy scaled-linear DDPM schedule.

Schedules are computed with numpy at trace time (they are static per sampling
program) and returned as float32 jnp arrays, descending, with a trailing 0.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def edm_sigmas(
    n: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    append_zero: bool = True,
) -> jnp.ndarray:
    """Karras et al. rho-spaced sigmas, descending from sigma_max to sigma_min."""
    ramp = np.linspace(0.0, 1.0, n)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    if append_zero:
        sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas, dtype=jnp.float32)


def _scaled_linear_alphas_cumprod(
    num_timesteps: int, linear_start: float, linear_end: float
) -> np.ndarray:
    betas = np.linspace(linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas, axis=0)


def legacy_ddpm_sigmas(
    n: int,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
    num_timesteps: int = 1000,
    append_zero: bool = True,
) -> jnp.ndarray:
    """Sigmas derived from a scaled-linear beta schedule, descending.

    For ``n < num_timesteps`` the sub-sampling picks roughly equally spaced
    integer timesteps, matching the reference's
    ``generate_roughly_equally_spaced_steps`` (discretizer.py:11-12).
    """
    alphas_cumprod = _scaled_linear_alphas_cumprod(num_timesteps, linear_start, linear_end)
    if n < num_timesteps:
        timesteps = np.linspace(num_timesteps - 1, 0, n, endpoint=False, dtype=int)[::-1]
        alphas_cumprod = alphas_cumprod[timesteps]
    elif n != num_timesteps:
        raise ValueError(f"n={n} exceeds num_timesteps={num_timesteps}")
    sigmas = ((1.0 - alphas_cumprod) / alphas_cumprod) ** 0.5
    sigmas = sigmas[::-1]  # descending (highest noise first)
    if append_zero:
        sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas, dtype=jnp.float32)
