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
