"""Long-horizon autoregressive rollout.

Behavioral counterpart of ``sample_utils.py:286-375`` (do_sample): round 1
predicts ``T`` frames from pinned context frames; every further round
re-conditions on the last 3 generated latents (moved to slots 0..2, mask
``[1,1,1,0,...]``) and appends ``T-3`` new frames, extending the horizon by
~2.3 s per round at 10 fps. The CLIP image conditioning for round ``n+1``
comes from decoding the tail of round ``n`` and taking frame ``-3``
(sample_utils.py:338-351); the VAE ``concat`` conditioning reuses the raw
latents (``skip_encode`` — no pixel round trip).

TPU-first: every round has identical shapes, so the per-round sampling
program compiles once and is re-invoked; only the tail decode for CLIP
leaves latent space. All state stays on device across rounds.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, FrozenSet, Optional, Tuple

import jax
import jax.numpy as jnp

from vista_tpu.diffusion.sampler import SamplerConfig
from vista_tpu.engine.engine import VistaEngine

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    num_rounds: int = 1
    n_context_frames: int = 3  # frames re-pinned between rounds
    initial_cond_indices: Tuple[int, ...] = (0,)
    force_uc_zero: FrozenSet[str] = frozenset(
        {"cond_frames", "cond_frames_without_noise",
         "command", "trajectory", "speed", "angle", "goal"})


def _frame_mask(indices, num_frames: int) -> jnp.ndarray:
    m = jnp.zeros((num_frames,), dtype=jnp.float32)
    return m.at[jnp.asarray(indices, dtype=jnp.int32)].set(1.0)


def autoregressive_rollout(
    engine: VistaEngine,
    params: Dict,
    images: Array,
    batch: Dict[str, Array],
    sampler: SamplerConfig,
    rollout: RolloutConfig = RolloutConfig(),
    key: Optional[jax.Array] = None,
    decode_output: bool = True,
    mesh=None,
    mesh_mode: str = "frames",
) -> Tuple[Optional[Array], Array]:
    """Run ``num_rounds`` of prediction.

    images: ``(T, h, w, 3)`` context pixels in [-1, 1] (first frame(s) condition).
    batch: conditioning scalars/actions; ``cond_frames_without_noise`` /
      ``cond_frames`` are overwritten per round.
    mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis — the denoise
      rounds then run sharded across chips (engine.jit_sample_sharded;
      ``mesh_mode="frames"`` shards the frame axis — ``num_frames`` must
      divide the axis size — and ``"height"`` shards latent rows, the
      sequence-parallel layout). Encode/conditioning/decode stay
      replicated; XLA inserts the reshards at the stage boundaries.
    Returns ``(pixels or None, latents)`` with
    ``latents.shape[0] == num_rounds*(T-3)+3``.
    """
    cfg = engine.cfg
    t = cfg.num_frames
    nc = rollout.n_context_frames
    key = key if key is not None else jax.random.key(0)
    k_enc, key = jax.random.split(key)

    # engine-cached jitted stages: eager execution dispatches per-op (slow
    # over remote devices) and fragments HBM; caller-level jax.jit closures
    # would recompile per rollout call
    encode_j = engine.jit_encode()
    cond_j = engine.jit_condition_pair(rollout.force_uc_zero)
    cond_skip_j = engine.jit_condition_pair(rollout.force_uc_zero, skip_encode=True)
    decode_j = engine.jit_decode()
    run_round = (engine.jit_sample_sharded(sampler, mesh, mode=mesh_mode)
                 if mesh is not None else engine.jit_sample(sampler))

    z = encode_j(params, images, k_enc)

    # ---- round 1: condition on the provided context frames ----
    batch0 = dict(batch)
    batch0["cond_frames_without_noise"] = images[:1]
    cond_aug = batch.get("cond_aug", jnp.zeros((1,)))
    k_aug, key = jax.random.split(key)
    batch0["cond_frames"] = images[:1] + cond_aug[0] * jax.random.normal(
        k_aug, images[:1].shape, dtype=images.dtype)
    c, uc = cond_j(params, batch0)

    mask0 = _frame_mask(rollout.initial_cond_indices, t)
    k_noise, key = jax.random.split(key)
    noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
    sample = run_round(params, noise, c, uc, z, mask0)
    sample = sample.at[0].set(z[0])

    # decode per round with FIXED shapes (t latents in, t frames out): one
    # compiled decode program serves every round and every horizon — decoding
    # the full num_rounds*(t-nc)+nc concatenation at the end would compile a
    # fresh program per num_rounds value. Rounds 2+ carry the previous
    # round's nc context latents through the decoder (temporal consistency)
    # and drop those frames from the output.
    all_latents = [sample]
    all_pixels = [decode_j(params, sample)] if decode_output else None

    pred_mask = _frame_mask(list(range(nc)), t)
    for n in range(rollout.num_rounds - 1):
        # CLIP conditioning image for the next round: frame -nc in pixels
        # (reuse the round decode when we have it; else decode just the tail)
        if decode_output:
            clip_frame = all_pixels[-1][-nc]
        else:
            clip_frame = decode_j(params, sample[-cfg.decode_chunk:])[-nc]
        batch_n = dict(batch)
        batch_n["cond_frames_without_noise"] = clip_frame[None]
        # latent reuse: divide the sampler-space (scaled) latent back to the
        # raw VAE latent the concat channel carries (sample_utils.py:343) —
        # identical to what the encode path produces for the same frame
        batch_n["cond_frames"] = sample[-nc][None] / cfg.vae.scale_factor
        c, uc = cond_skip_j(params, batch_n)

        filled = jnp.zeros_like(sample).at[:nc].set(sample[-nc:])
        k_noise, key = jax.random.split(key)
        noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
        sample = run_round(params, noise, c, uc, filled, pred_mask)
        all_latents.append(sample[nc:])
        if decode_output:
            all_pixels.append(decode_j(params, sample)[nc:])

    latents = jnp.concatenate(all_latents, axis=0)
    if not decode_output:
        return None, latents
    pixels = jnp.concatenate(all_pixels, axis=0)
    pixels = jnp.clip((pixels + 1.0) / 2.0, 0.0, 1.0)
    return pixels, latents
