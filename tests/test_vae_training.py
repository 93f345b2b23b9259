"""First-stage (VAE) training step contracts."""

import numpy as np
import jax
import jax.numpy as jnp

from vista_tpu.engine.vae_training import (
    VAETrainConfig,
    create_vae_train_state,
    hinge_d_loss,
    make_vae_train_step,
)
from vista_tpu.models.vae import VAEConfig

H = W = 16


def _setup(disc_weight=0.5, disc_start=0):
    cfg = VAETrainConfig(learning_rate=1e-4, disc_weight=disc_weight,
                         disc_start=disc_start, disc_channels=8, disc_layers=2)
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, dtype="float32")
    state, ae_tx, disc_tx, enc, dec, disc = create_vae_train_state(
        cfg, vae_cfg, jax.random.key(0), H, W)
    step = jax.jit(make_vae_train_step(cfg, enc, dec, disc, ae_tx, disc_tx))
    return state, step


class TestVAETraining:
    def test_hinge_loss_values(self):
        real = jnp.array([2.0])
        fake = jnp.array([-2.0])
        assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
        assert float(hinge_d_loss(-real, -fake)) == 3.0

    def test_ae_only_step_updates_encoder_decoder(self):
        state, step = _setup(disc_weight=0.0)
        x = jnp.asarray(np.random.RandomState(0).randn(2, H, W, 3) * 0.3, jnp.float32)
        new_state, m = step(state, x, jax.random.key(1))
        assert np.isfinite(float(m["loss"]))
        assert float(m["rec"]) > 0
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.ae_params, new_state.ae_params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_alternating_updates_discriminator(self):
        state, step = _setup(disc_weight=0.5, disc_start=0)
        x = jnp.asarray(np.random.RandomState(0).randn(2, H, W, 3) * 0.3, jnp.float32)
        s1, m1 = step(state, x, jax.random.key(1))   # step 0: AE
        s2, m2 = step(s1, x, jax.random.key(2))      # step 1: disc
        assert float(m1["which"]) == 0.0
        assert float(m2["which"]) == 1.0
        d_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                              s1.disc_params, s2.disc_params)
        assert max(jax.tree.leaves(d_diff)) > 0
        # AE untouched during the disc step
        ae_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                               s1.ae_params, s2.ae_params)
        assert max(jax.tree.leaves(ae_diff)) == 0
