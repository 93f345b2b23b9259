"""EMA of parameters as a pytree transform.

Counterpart of ``vwm/modules/ema.py`` (LitEma): shadow values updated with
warmup decay ``min(decay, (1 + n) / (10 + n))``, stored as an ordinary
pytree (not name-mangled buffers — the reference's dot-stripped key mangling
and ``bin_to_st.py`` swap disappear; the checkpoint simply holds two pytrees).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def ema_init(params):
    # real copies, not aliases: the shadow tree must own its buffers so a
    # train step can donate the whole TrainState (aliased leaves would be
    # the same buffer donated twice)
    return jax.tree.map(lambda x: jnp.array(x, copy=True), params)


def ema_update(ema_params, params, num_updates, decay: float = 0.9999):
    """One EMA step; ``num_updates`` is the count *after* this optimizer step."""
    d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    return jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p), ema_params, params)
