"""Classifier-free guidance as pure functions.

The reference ships four guiders (vwm/modules/diffusionmodules/guiders.py):
Identity, VanillaCFG (scalar scale), LinearPredictionGuider (per-frame scale
linspace min->max) and TrianglePredictionGuider (triangle-wave per-frame
scale). All non-identity guiders are the same computation — double the batch
as ``[uncond, cond]``, then merge ``x_u + s_t * (x_c - x_u)`` with a per-frame
scale vector — so here they collapse to one merge function driven by a static
``(num_frames,)`` scale vector computed once at trace time.

TPU note: the conditioning dict is doubled once, *outside* the sampler scan,
so the scan body sees static shapes and the guidance merge fuses into the
sampler's elementwise epilogue.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import numpy as np
import jax.numpy as jnp

from vista_tpu.utils.basic import append_dims

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GuiderConfig:
    """Static description of a guider.

    kind: "identity" | "vanilla" | "linear" | "triangle"
    scale: max (or only) guidance scale
    min_scale: minimum per-frame scale (linear/triangle)
    period: triangle-wave period(s) (triangle only)
    period_fusing: "mean" | "multiply" | "max" (triangle only)
    """

    kind: str = "vanilla"
    scale: float = 2.5
    min_scale: float = 1.0
    num_frames: int = 25
    period: Union[float, Sequence[float]] = 1.0
    period_fusing: str = "max"


def _triangle_wave(values: np.ndarray, period: float) -> np.ndarray:
    return 2.0 * np.abs(values / period - np.floor(values / period + 0.5))


def guider_frame_scales(cfg: GuiderConfig) -> Optional[np.ndarray]:
    """Per-frame guidance scales, shape ``(num_frames,)``; None for identity."""
    t = cfg.num_frames
    if cfg.kind == "identity":
        return None
    if cfg.kind == "vanilla":
        return np.full((t,), cfg.scale, dtype=np.float32)
    if cfg.kind == "linear":
        return np.linspace(cfg.min_scale, cfg.scale, t, dtype=np.float32)
    if cfg.kind == "triangle":
        values = np.linspace(0.0, 1.0, t)
        periods = cfg.period if isinstance(cfg.period, (list, tuple)) else [cfg.period]
        waves = np.stack([_triangle_wave(values, p) for p in periods])
        if cfg.period_fusing == "mean":
            wave = waves.mean(0)
        elif cfg.period_fusing == "multiply":
            wave = waves.prod(0)
        elif cfg.period_fusing == "max":
            wave = waves.max(0)
        else:
            raise ValueError(f"unknown period_fusing {cfg.period_fusing!r}")
        return (wave * (cfg.scale - cfg.min_scale) + cfg.min_scale).astype(np.float32)
    raise ValueError(f"unknown guider kind {cfg.kind!r}")


def cfg_merge(denoised_pair: Array, frame_scales: Optional[Array], num_frames: int) -> Array:
    """Merge a batch-doubled denoiser output ``[uncond; cond]`` with per-frame scales.

    denoised_pair: ``(2*b*t, ...)`` with the uncond half first (reference
    guiders.py concatenates ``(uc, c)``).
    frame_scales: ``(num_frames,)`` or None (identity -> return input as-is).
    """
    if frame_scales is None:
        return denoised_pair
    x_u, x_c = jnp.split(denoised_pair, 2, axis=0)
    scale = jnp.tile(jnp.asarray(frame_scales, dtype=x_u.dtype), x_u.shape[0] // num_frames)
    scale = append_dims(scale, x_u.ndim)
    return x_u + scale * (x_c - x_u)
