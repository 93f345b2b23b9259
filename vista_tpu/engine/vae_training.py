"""First-stage (VAE) training: reconstruction + KL + optional PatchGAN.

Counterpart of the reference's ``AutoencodingEngine`` training plumbing
(vwm/models/autoencoder.py:98-429): manual alternating optimization between
the autoencoder ("generator") and a discriminator. The reference repo ships
only the plumbing — its loss module is config-pluggable and every shipped
Vista config freezes the VAE with ``loss: Identity`` — so the loss here is a
standard latent-VAE recipe: L1/L2 reconstruction + KL weight + hinge-GAN
with a PatchGAN discriminator, expressed as two pure jitted steps that
alternate by step parity (the Lightning ``optimizer_idx`` counterpart).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from vista_tpu.models.vae import (
    VAEConfig,
    VAEDecoder,
    VAEEncoder,
    gaussian_kl,
    gaussian_sample,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    learning_rate: float = 4.5e-6
    recon_loss: str = "l1"  # "l1" | "l2"
    kl_weight: float = 1e-6
    disc_weight: float = 0.5
    disc_start: int = 50001  # generator sees adversarial loss after this step
    disc_channels: int = 64
    disc_layers: int = 3


class PatchDiscriminator(nn.Module):
    """PatchGAN: stride-2 conv stack -> per-patch real/fake logits (NHWC)."""

    base_channels: int = 64
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ch = self.base_channels
        x = nn.Conv(ch, (4, 4), strides=(2, 2), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        x = nn.leaky_relu(x, 0.2)
        for i in range(1, self.num_layers):
            ch = min(ch * 2, 512)
            x = nn.Conv(ch, (4, 4), strides=(2, 2), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(32, ch), dtype=jnp.float32, name=f"norm_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv_out")(x)


def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake)))


class VAETrainState(struct.PyTreeNode):
    step: Array
    ae_params: Any       # {"encoder": ..., "decoder": ...}
    ae_opt: Any
    disc_params: Any
    disc_opt: Any


def create_vae_train_state(
    cfg: VAETrainConfig, vae_cfg: VAEConfig, key: jax.Array, height: int, width: int
) -> Tuple[VAETrainState, optax.GradientTransformation, optax.GradientTransformation,
           VAEEncoder, VAEDecoder, PatchDiscriminator]:
    k1, k2, k3 = jax.random.split(key, 3)
    encoder = VAEEncoder(vae_cfg)
    decoder = VAEDecoder(vae_cfg)
    disc = PatchDiscriminator(cfg.disc_channels, cfg.disc_layers)
    x = jnp.zeros((1, height, width, vae_cfg.in_channels))
    f = vae_cfg.downsample_factor
    z = jnp.zeros((1, height // f, width // f, vae_cfg.z_channels))
    ae_params = {
        "encoder": jax.jit(encoder.init)(k1, x)["params"],
        "decoder": jax.jit(decoder.init)(k2, z)["params"],
    }
    disc_params = jax.jit(disc.init)(k3, x)["params"]
    ae_tx = optax.adam(cfg.learning_rate, b1=0.5, b2=0.9)
    disc_tx = optax.adam(cfg.learning_rate, b1=0.5, b2=0.9)
    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        ae_params=ae_params, ae_opt=ae_tx.init(ae_params),
        disc_params=disc_params, disc_opt=disc_tx.init(disc_params),
    )
    return state, ae_tx, disc_tx, encoder, decoder, disc


def make_vae_train_step(cfg: VAETrainConfig, encoder: VAEEncoder, decoder: VAEDecoder,
                        disc: PatchDiscriminator, ae_tx, disc_tx):
    """One alternating step: even steps update the AE, odd steps the disc."""

    def reconstruct(ae_params, x, key):
        moments = encoder.apply({"params": ae_params["encoder"]}, x)
        z = gaussian_sample(moments, key)
        return decoder.apply({"params": ae_params["decoder"]}, z), moments

    def recon_term(x, x_rec):
        err = x_rec - x
        return jnp.mean(jnp.abs(err)) if cfg.recon_loss == "l1" else jnp.mean(err**2)

    def step_fn(state: VAETrainState, x: Array, key: jax.Array):
        use_gan = cfg.disc_weight > 0.0

        def ae_loss_fn(ae_params):
            x_rec, moments = reconstruct(ae_params, x, key)
            rec = recon_term(x, x_rec)
            kl = gaussian_kl(moments).mean()
            loss = rec + cfg.kl_weight * kl
            if use_gan:
                logits_fake = disc.apply({"params": state.disc_params}, x_rec)
                g_adv = -jnp.mean(logits_fake)
                adv_on = (state.step >= cfg.disc_start).astype(jnp.float32)
                loss = loss + cfg.disc_weight * adv_on * g_adv
            return loss, {"rec": rec, "kl": kl}

        def disc_loss_fn(disc_params):
            x_rec, _ = reconstruct(state.ae_params, x, key)
            logits_real = disc.apply({"params": disc_params}, x)
            logits_fake = disc.apply({"params": disc_params}, jax.lax.stop_gradient(x_rec))
            return hinge_d_loss(logits_real, logits_fake)

        def ae_step(state):
            (loss, aux), grads = jax.value_and_grad(ae_loss_fn, has_aux=True)(state.ae_params)
            updates, ae_opt = ae_tx.update(grads, state.ae_opt, state.ae_params)
            return state.replace(
                step=state.step + 1,
                ae_params=optax.apply_updates(state.ae_params, updates),
                ae_opt=ae_opt,
            ), {"loss": loss, **aux, "which": jnp.float32(0)}

        def disc_step(state):
            loss, grads = jax.value_and_grad(disc_loss_fn)(state.disc_params)
            updates, disc_opt = disc_tx.update(grads, state.disc_opt, state.disc_params)
            return state.replace(
                step=state.step + 1,
                disc_params=optax.apply_updates(state.disc_params, updates),
                disc_opt=disc_opt,
            ), {"loss": loss, "rec": jnp.float32(0), "kl": jnp.float32(0),
                "which": jnp.float32(1)}

        if not use_gan:
            return ae_step(state)
        # alternate: even -> AE, odd (after disc_start) -> discriminator
        train_disc = jnp.logical_and(state.step % 2 == 1, state.step >= cfg.disc_start)
        return jax.lax.cond(train_disc, disc_step, ae_step, state)

    return step_fn
