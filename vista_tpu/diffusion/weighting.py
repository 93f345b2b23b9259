"""Per-sigma diffusion loss weightings.

Counterpart of ``vwm/modules/diffusionmodules/loss_weighting.py``. Shipped
Vista training uses ``VWeighting`` = EDM weighting with sigma_data=1
(configs/training/vista_phase1.yaml:188-189).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def unit_weighting(sigma: Array) -> Array:
    return jnp.ones_like(sigma)


def edm_weighting(sigma: Array, sigma_data: float = 0.5) -> Array:
    return (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2


def v_weighting(sigma: Array) -> Array:
    return edm_weighting(sigma, sigma_data=1.0)


def eps_weighting(sigma: Array) -> Array:
    return sigma**-2.0


_WEIGHTINGS = {
    "unit": unit_weighting,
    "edm": edm_weighting,
    "v": v_weighting,
    "eps": eps_weighting,
}


def get_weighting(name: str):
    try:
        return _WEIGHTINGS[name]
    except KeyError:
        raise ValueError(f"unknown weighting {name!r}; one of {sorted(_WEIGHTINGS)}") from None
