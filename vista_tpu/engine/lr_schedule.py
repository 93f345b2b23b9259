"""LR multiplier schedules as optax-compatible functions.

Counterparts of ``vwm/lr_scheduler.py``: ``lambda_linear`` (shipped:
1000-step linear warmup then linear decay over the cycle; with
f_min == f_max it is warmup-then-flat, configs/training/vista_phase1.yaml:
158-165) and ``warmup_cosine``.
"""

from __future__ import annotations

import jax.numpy as jnp


def lambda_linear(
    warm_up_steps: int = 1000,
    f_start: float = 1e-6,
    f_min: float = 1.0,
    f_max: float = 1.0,
    cycle_length: float = 1e13,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) * step / max(warm_up_steps, 1)
        decay = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        return jnp.where(step < warm_up_steps, warm, decay)

    return schedule


def warmup_cosine(
    warm_up_steps: int,
    f_start: float,
    f_min: float,
    f_max: float,
    max_decay_steps: float,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) * step / max(warm_up_steps, 1)
        t = jnp.clip((step - warm_up_steps) / (max_decay_steps - warm_up_steps), 0.0, 1.0)
        cos = f_min + 0.5 * (f_max - f_min) * (1.0 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule
