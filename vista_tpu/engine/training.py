"""The training loop: one jit-able SPMD train step.

Replaces the reference's Lightning + DeepSpeed runtime (train.py,
diffusion.py training_step/configure_optimizers) with explicit JAX:

- the UNet is the trainable partition; VAE / CLIP conditioner stay frozen
  outside the grad pytree (the reference freezes them with
  ``requires_grad=False`` + DDP ``find_unused_parameters``, train.py:736);
- parameter-group policies (diffusion.py:260-291):
  ``full`` (everything), ``slow_spatial`` (temporal params at lr, spatial at
  0.1x — matched by the same name predicate the reference uses), and
  ``lora_only`` (only adapter params receive updates);
- AdamW + global-norm clip (grad_clip 0.3, vista_phase1.yaml) + LambdaLinear
  warmup schedule, gradient accumulation via ``optax.MultiSteps``
  (Lightning ``accumulate_grad_batches`` counterpart);
- EMA shadow params updated per optimizer step (LitEma counterpart);
- data parallel over the mesh ``data`` axis; optimizer state / params can be
  sharded over ``fsdp`` (the ZeRO counterpart) by sharding the TrainState
  with ``vista_tpu.parallel.fsdp_param_specs``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vista_tpu.diffusion.loss import LossConfig, diffusion_loss
from vista_tpu.engine.ema import ema_init, ema_update
from vista_tpu.engine.engine import VistaEngine
from vista_tpu.engine.lr_schedule import lambda_linear

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 1e-2
    grad_clip: float = 0.3
    warmup_steps: int = 1000
    accum_steps: int = 1
    policy: str = "full"  # "full" | "slow_spatial" | "lora_only"
    slow_spatial_factor: float = 0.1
    ema_decay: float = 0.9999
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)


# name predicate matching the reference's `"time_stack" in name` group
# (diffusion.py:263-272). Our temporal-attention blocks are named
# ``time_block_*`` (the reference calls them ``time_stack``), and
# ``cond_time_stack_embed`` matches in both.
_TEMPORAL_TOKENS = ("time_stack", "time_block", "cond_time_stack_embed")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def lr_mult_tree(unet_params, policy: str, slow_factor: float = 0.1):
    """Per-leaf LR multiplier implementing the reference param groups."""

    def mult(path, leaf):
        name = _path_str(path)
        if policy == "full":
            return 1.0
        if policy == "slow_spatial":
            return 1.0 if any(t in name for t in _TEMPORAL_TOKENS) else slow_factor
        if policy == "lora_only":
            return 1.0 if "adapter" in name else 0.0
        raise ValueError(f"unknown policy {policy!r}")

    return jax.tree_util.tree_map_with_path(mult, unet_params)


def scale_updates_by_tree(mult_tree) -> optax.GradientTransformation:
    """Multiply each update leaf by its (python float) multiplier.

    Tolerates ``optax.MaskedNode`` placeholders (present when running inside
    ``multi_transform``/``masked`` partitions)."""

    def _is_masked(x):
        return type(x).__name__ == "MaskedNode"

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree.map(
            lambda u, m: u if _is_masked(u) else u * m,
            updates, mult_tree, is_leaf=_is_masked)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig, unet_params) -> optax.GradientTransformation:
    mults = lr_mult_tree(unet_params, cfg.policy, cfg.slow_spatial_factor)
    schedule = lambda_linear(warm_up_steps=cfg.warmup_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay),
        scale_updates_by_tree(mults),
        optax.scale_by_schedule(lambda s: -cfg.learning_rate * schedule(s)),
    )
    # don't allocate Adam moments for frozen leaves (lr multiplier 0) and
    # hard-zero their updates: with lora_only this drops ~12 GB of fp32
    # optimizer state for the 1.5B frozen base
    labels = jax.tree.map(lambda m: "train" if m > 0.0 else "freeze", mults)
    if "freeze" in jax.tree.leaves(labels):
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


class TrainState(struct.PyTreeNode):
    step: Array
    unet_params: Any
    opt_state: Any
    ema_params: Any


def create_train_state(cfg: TrainConfig, params: Dict) -> Tuple[TrainState, optax.GradientTransformation]:
    unet_params = params["unet"]
    tx = make_optimizer(cfg, unet_params)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            unet_params=unet_params,
            opt_state=tx.init(unet_params),
            ema_params=ema_init(unet_params),
        ),
        tx,
    )


def make_train_step(engine: VistaEngine, cfg: TrainConfig, tx: optax.GradientTransformation):
    """Build the jit-able step: ``(state, frozen, batch, key) -> (state, metrics)``.

    batch:
      frames: ``(b, t, h, w, 3)`` pixels in [-1, 1]
      fps_id/motion_bucket_id/cond_aug: ``(b,)``
      optional action keys (command/trajectory/speed/angle/goal)
    frozen: the non-UNet params ``{"encoder", "decoder", "conditioner"}``.
    """
    num_frames = engine.cfg.num_frames

    def step_fn(state: TrainState, frozen: Dict, batch: Dict[str, Array], key: jax.Array):
        k_enc, k_aug, k_ucg, k_loss = jax.random.split(key, 4)

        frames = batch["frames"]
        b, t = frames.shape[0], frames.shape[1]
        flat = frames.reshape(b * t, *frames.shape[2:])

        # frozen first stage + conditioner (outside the grad pytree)
        full_frozen = {**frozen, "unet": state.unet_params}
        latents = jax.lax.stop_gradient(
            engine.encode_first_stage(full_frozen, flat, key=k_enc))

        cond_batch = {k: v for k, v in batch.items() if k != "frames"}
        first_frames = frames[:, 0]
        cond_batch["cond_frames_without_noise"] = first_frames
        cond_aug = batch["cond_aug"]
        cond_batch["cond_frames"] = first_frames + cond_aug[:, None, None, None] * (
            jax.random.normal(k_aug, first_frames.shape, dtype=first_frames.dtype))
        cond = jax.lax.stop_gradient(
            engine.conditions(full_frozen, cond_batch, ucg_key=k_ucg))

        def loss_fn(unet_params):
            params = {**frozen, "unet": unet_params}
            denoise = engine.denoise_fn(params, num_frames)
            loss, aux = diffusion_loss(denoise, latents, cond, k_loss, cfg.loss)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.unet_params)
        updates, opt_state = tx.update(grads, state.opt_state, state.unet_params)
        unet_params = optax.apply_updates(state.unet_params, updates)
        step = state.step + 1
        ema_params = ema_update(state.ema_params, unet_params, step, cfg.ema_decay)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return (
            TrainState(step=step, unet_params=unet_params, opt_state=opt_state,
                       ema_params=ema_params),
            metrics,
        )

    return step_fn


def make_eval_step(engine: VistaEngine, cfg: TrainConfig):
    """Loss-only counterpart of ``make_train_step`` for held-out evaluation —
    the reference's ``trainer.test`` path (train.py:897-898,
    vwm/models/diffusion.py:227-230: test_step = the training loss on val
    batches, no optimizer step).

    ``(unet_params, frozen, batch, key) -> (loss, aux)``. The caller picks
    the weights: pass ``state.ema_params`` for the EMA metric ("did my
    finetune regress") or ``state.unet_params`` for the online loss. No ucg
    dropout is applied (deterministic given the key); sigma sampling and the
    cond-frame mask choice still come from ``key`` — fix it per batch index
    for a comparable metric across evals."""
    num_frames = engine.cfg.num_frames

    def eval_fn(unet_params: Dict, frozen: Dict, batch: Dict[str, Array], key: jax.Array):
        k_enc, k_aug, k_loss = jax.random.split(key, 3)

        frames = batch["frames"]
        b, t = frames.shape[0], frames.shape[1]
        flat = frames.reshape(b * t, *frames.shape[2:])

        full = {**frozen, "unet": unet_params}
        latents = engine.encode_first_stage(full, flat, key=k_enc)

        cond_batch = {k: v for k, v in batch.items() if k != "frames"}
        first_frames = frames[:, 0]
        cond_batch["cond_frames_without_noise"] = first_frames
        cond_aug = batch["cond_aug"]
        cond_batch["cond_frames"] = first_frames + cond_aug[:, None, None, None] * (
            jax.random.normal(k_aug, first_frames.shape, dtype=first_frames.dtype))
        cond = engine.conditions(full, cond_batch, ucg_key=None)

        denoise = engine.denoise_fn(full, num_frames)
        return diffusion_loss(denoise, latents, cond, k_loss, cfg.loss)

    return eval_fn
