"""Euler-EDM sampling loop compiled as a single ``lax.scan`` program.

Behavioral counterpart of the reference's ``EulerEDMSampler``
(vwm/modules/diffusionmodules/sampling.py:70-124) with Vista's semantics:

- initial noise is rescaled by ``sqrt(1 + sigma_0^2)`` (sampling.py:36);
- *every* step re-pins the conditional context frames into the state
  (``x = x*(1-m) + cond_frame*m``, sampling.py:104-106) and once more after
  the loop — this inpainting-style frame replacement is how context frames
  drive the prediction;
- classifier-free guidance doubles the batch as ``[uncond; cond]`` and merges
  with per-frame scales (guiders.py).

TPU-first design: the conditioning dict is doubled once outside the scan, the
sigma schedule is a static trace-time table, and the per-step stochastic churn
uses ``jax.random.fold_in`` so the whole ``num_steps`` loop compiles to one
XLA while-loop with static shapes. The latent carry is donated through the
scan; nothing round-trips to the host.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from vista_tpu.diffusion.discretization import edm_sigmas
from vista_tpu.diffusion.guidance import GuiderConfig, cfg_merge, guider_frame_scales
from vista_tpu.utils.basic import append_dims

Array = jnp.ndarray

# denoise_fn(x, sigma, cond, cond_mask) -> denoised estimate (preconditioning included)
DenoiseFn = Callable[[Array, Array, dict, Optional[Array]], Array]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler description (fully determines the compiled program)."""

    num_steps: int = 50
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = 999.0
    s_noise: float = 1.0
    guider: GuiderConfig = dataclasses.field(default_factory=GuiderConfig)
    # "batched" doubles the batch for the CFG pair (fastest when memory
    # allows); "sequential" runs uncond/cond as two calls — same FLOPs,
    # half the activation memory (needed at 576x1024 on 16 GB chips).
    cfg_mode: str = "batched"


def _double_cond(cond: dict, uc: dict) -> dict:
    """Concatenate ``(uncond, cond)`` per key along the batch axis (once, pre-scan)."""
    return {k: jnp.concatenate([uc[k], cond[k]], axis=0) for k in cond}


def sample_euler_edm(
    denoise_fn: DenoiseFn,
    noise: Array,
    cond: dict,
    uc: Optional[dict] = None,
    cond_frame: Optional[Array] = None,
    cond_mask: Optional[Array] = None,
    config: SamplerConfig = SamplerConfig(),
    num_frames: int = 25,
    key: Optional[jax.Array] = None,
) -> Array:
    """Run the full Euler-EDM loop; returns the final latents ``(b*t, h, w, c)``.

    noise: standard normal latents ``(b*t, h, w, c)``.
    cond / uc: conditioning dicts (same pytree structure).
    cond_frame: clean latents providing the pinned context frames.
    cond_mask: ``(b*t,)`` 0/1 mask of which frames are pinned context.
    """
    sigmas = edm_sigmas(config.num_steps, config.sigma_min, config.sigma_max, config.rho)
    num_sigmas = int(sigmas.shape[0])

    frame_scales = guider_frame_scales(config.guider)
    guided = frame_scales is not None and uc is not None
    doubled = guided and config.cfg_mode == "batched"
    cond_all = _double_cond(cond, uc) if doubled else cond

    replace_cond_frames = cond_frame is not None and cond_mask is not None
    if replace_cond_frames:
        mask_b = append_dims(cond_mask.astype(noise.dtype), noise.ndim)

    x = noise * jnp.sqrt(1.0 + sigmas[0] ** 2)

    gamma_max = min(config.s_churn / (num_sigmas - 1), math.sqrt(2.0) - 1.0)
    use_churn = config.s_churn > 0.0
    if use_churn and key is None:
        raise ValueError("s_churn > 0 requires a PRNG key")

    def pin(x):
        if replace_cond_frames:
            return x * (1.0 - mask_b) + cond_frame * mask_b
        return x

    def denoise(x, sigma_scalar):
        s1 = jnp.full((x.shape[0],), sigma_scalar, dtype=jnp.float32)
        if doubled:
            x2 = jnp.concatenate([x, x], axis=0)
            s2 = jnp.concatenate([s1, s1], axis=0)
            m2 = jnp.concatenate([cond_mask, cond_mask], axis=0) if cond_mask is not None else None
            out = denoise_fn(x2, s2, cond_all, m2)
            return cfg_merge(out, frame_scales, num_frames)
        if guided:
            # sequential CFG: scan over the stacked (uncond, cond) pair —
            # a scan (unlike two independent calls, which XLA schedules
            # concurrently) guarantees serialized execution and buffer
            # reuse, halving live activations
            stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), uc, cond)

            def one(_, c):
                return None, denoise_fn(x, s1, c, cond_mask)

            _, outs = jax.lax.scan(one, None, stacked)
            return cfg_merge(jnp.concatenate([outs[0], outs[1]], axis=0),
                             frame_scales, num_frames)
        return denoise_fn(x, s1, cond_all, cond_mask)

    def body(x, inputs):
        i, sigma, next_sigma = inputs
        x = pin(x)
        if use_churn:
            in_churn_range = jnp.logical_and(config.s_tmin <= sigma, sigma <= config.s_tmax)
            gamma = jnp.where(in_churn_range, gamma_max, 0.0)
            sigma_hat = sigma * (gamma + 1.0)
            eps = jax.random.normal(jax.random.fold_in(key, i), x.shape, dtype=x.dtype)
            extra = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            x = x + eps * config.s_noise * extra
        else:
            sigma_hat = sigma
        denoised = denoise(x, sigma_hat)
        d = (x - denoised) / sigma_hat
        x = x + (next_sigma - sigma_hat) * d
        return x, None

    steps = jnp.arange(num_sigmas - 1)
    x, _ = jax.lax.scan(body, x, (steps, sigmas[:-1], sigmas[1:]))
    return pin(x)
