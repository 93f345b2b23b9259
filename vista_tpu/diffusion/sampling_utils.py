"""Small sampling helpers (counterpart of vwm/modules/diffusionmodules/sampling_utils.py).

``to_d`` is inlined in the sampler's scan body; these standalone versions
exist for reuse and for the auxiliary samplers (ancestral, linear-multistep).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from vista_tpu.utils.basic import append_dims

Array = jnp.ndarray


def to_d(x: Array, sigma: Array, denoised: Array) -> Array:
    """ODE derivative for the probability-flow formulation."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def apply_cfg_with_rescale(pos: Array, neg: Array, scale: float, rescale: float = 0.7) -> Array:
    """CFG with std-rescale (sampling_utils.py:8-17): fixes over-saturation by
    matching the guided output's std to the conditional branch's."""
    cfg = neg + scale * (pos - neg)
    axes = tuple(range(1, pos.ndim))
    std_pos = pos.std(axis=axes, keepdims=True)
    std_cfg = cfg.std(axis=axes, keepdims=True)
    factor = rescale * (std_pos / std_cfg) + (1.0 - rescale)
    return cfg * factor


def get_ancestral_step(sigma_from: Array, sigma_to: Array, eta: float = 1.0) -> Tuple[Array, Array]:
    """(sigma_down, sigma_up) split for ancestral (SDE) sampling."""
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2),
    )
    sigma_down = jnp.sqrt(sigma_to**2 - sigma_up**2)
    return sigma_down, sigma_up


def linear_multistep_coeff(order: int, t, i: int, j: int, n_quad: int = 257) -> float:
    """LMS coefficient via numerical quadrature (no scipy dependency —
    fixed-sample Simpson integration of the Lagrange basis product)."""

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    a, b = float(t[i]), float(t[i + 1])
    if a == b:
        return 0.0
    n = n_quad if n_quad % 2 == 1 else n_quad + 1
    xs = [a + (b - a) * k / (n - 1) for k in range(n)]
    ys = [fn(x) for x in xs]
    h = (b - a) / (n - 1)
    s = ys[0] + ys[-1] + 4.0 * sum(ys[1:-1:2]) + 2.0 * sum(ys[2:-1:2])
    return s * h / 3.0


def to_neg_log_sigma(sigma: Array) -> Array:
    return -jnp.log(sigma)


def to_sigma(neg_log_sigma: Array) -> Array:
    return jnp.exp(-neg_log_sigma)
