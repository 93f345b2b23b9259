"""The conditioning stack as one Flax module over a typed batch.

Behavioral counterpart of ``vwm/modules/encoders/modules.py`` (the
GeneralConditioner and its embedders) specialized to Vista's shipped set
(configs/inference/vista.yaml:42-144):

- ``cond_frames_without_noise`` -> frozen OpenCLIP ViT-H image embedding,
  one 1024-d token per video -> ``crossattn`` (b, 1, 1024);
- ``fps_id`` / ``motion_bucket_id`` / ``cond_aug`` -> 256-d sinusoidal
  embeds summed into ``vector`` (b, 768 = adm_in_channels) by concatenation;
- ``cond_frames`` -> frozen VAE encoder (posterior *mode*), UNSCALED (the
  embedder's scale_factor defaults to 1.0 in the reference), one 4-channel
  latent per video -> ``concat`` (b, h/8, w/8, 4);
- five action modalities (command 1, trajectory 8, speed 4, angle 4, goal 2)
  -> 128-d sinusoidal per scalar, concatenated onto the crossattn feature
  axis (19*128 = 2432 extra dims matching the UNet's action-control K/V
  adapters). Missing actions are zero-filled so the context width is static
  (modules.py:128-130).

Replaces the reference's ndim-based output routing and module-mutation
toggles (``skip_encode``, per-embedder ``ucg_rate`` fields) with explicit
arguments: ``skip_encode`` is a call argument, classifier-free dropout takes
an explicit PRNG key, and unconditional embeddings are built by a pure
``force_zero`` set.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, FrozenSet, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vista_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower, clip_preprocess
from vista_tpu.models.layers import timestep_embedding
from vista_tpu.models.vae import VAEConfig, VAEEncoder, gaussian_mode

Array = jnp.ndarray

# (key, num scalar features) for the five action modalities, in context order
ACTION_SPECS: Tuple[Tuple[str, int], ...] = (
    ("command", 1),
    ("trajectory", 8),
    ("speed", 4),
    ("angle", 4),
    ("goal", 2),
)
ACTION_EMB_DIM = 128


def _identity_conv_init(key, shape, dtype=jnp.float32):
    """1x1 conv kernel initialized to the identity channel map."""
    kh, kw, cin, cout = shape
    assert kh == kw == 1 and cin == cout
    return jnp.eye(cin, dtype=dtype).reshape(1, 1, cin, cout)


@dataclasses.dataclass(frozen=True)
class ConditionerConfig:
    clip: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    vector_outdim: int = 256  # fps/motion/cond_aug embed width (3*256 = 768 adm)
    action_control: bool = False
    # train-time classifier-free dropout: rate applies ONLY to the embedders
    # named in ucg_keys. The reference trains with ucg_rate 0.15 on the two
    # cond-frame embedders (phase 1) plus the five action embedders (phase 2)
    # and 0.0 on fps/motion/cond_aug
    # (configs/training/vista_phase1.yaml:55,67,74,81,113;
    # vista_phase2_stage1.yaml:120-156).
    ucg_rate: float = 0.0
    ucg_keys: Tuple[str, ...] = ("cond_frames_without_noise", "cond_frames")

    def tiny(self) -> "ConditionerConfig":
        return dataclasses.replace(self, clip=self.clip.tiny(), vae=self.vae.tiny())


def concat_timestep_embed(x: Array, outdim: int) -> Array:
    """Embed each scalar of ``(b, d)`` sinusoidally and concat -> ``(b, d*outdim)``.

    Counterpart of ConcatTimestepEmbedderND (modules.py:402-425).
    """
    if x.ndim == 1:
        x = x[:, None]
    b, d = x.shape
    emb = timestep_embedding(x.reshape(-1), outdim)
    return emb.reshape(b, d * outdim)


class GeneralConditioner(nn.Module):
    """Produces ``{"vector", "crossattn", "concat"}`` from a typed batch dict.

    Batch keys (all optional except the scalars):
      cond_frames_without_noise: (b, h, w, 3) pixels in [-1, 1]
      cond_frames: (b, h, w, 3) pixels, or (b, h/8, w/8, z) latents with
        ``skip_encode=True`` (the rollout's latent reuse,
        sample_utils.py:345-351)
      fps_id, motion_bucket_id, cond_aug: (b,)
      command/trajectory/speed/angle/goal: (b, d) — optional, zero-filled
        when absent and ``action_control`` is on.
    """

    cfg: ConditionerConfig

    def setup(self):
        self.clip_tower = CLIPVisionTower(self.cfg.clip)
        self.cond_frames_encoder = VAEEncoder(self.cfg.vae)
        zc = 2 * self.cfg.vae.z_channels if self.cfg.vae.double_z else self.cfg.vae.z_channels
        self.quant_conv = nn.Conv(zc, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                                  kernel_init=_identity_conv_init)

    def __call__(
        self,
        batch: Dict[str, Array],
        force_zero: FrozenSet[str] = frozenset(),
        skip_encode: bool = False,
        ucg_key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        cfg = self.cfg
        out: Dict[str, Array] = {}
        b = batch["cond_aug"].shape[0]

        def maybe_drop(emb: Array, key_name: str, subkey_idx: int) -> Array:
            """Per-embedder CFG dropout (Bernoulli keep mask) / forced zeroing."""
            if key_name in force_zero:
                return jnp.zeros_like(emb)
            if ucg_key is not None and cfg.ucg_rate > 0.0 and key_name in cfg.ucg_keys:
                k = jax.random.fold_in(ucg_key, subkey_idx)
                keep = jax.random.bernoulli(k, 1.0 - cfg.ucg_rate, (emb.shape[0],))
                return emb * keep.astype(emb.dtype).reshape((-1,) + (1,) * (emb.ndim - 1))
            return emb

        # --- crossattn: CLIP image token (+ action embeds on the feature axis) ---
        clip_in = clip_preprocess(batch["cond_frames_without_noise"], cfg.clip.image_size)
        clip_emb = self.clip_tower(clip_in)[:, None, :]  # (b, 1, 1024)
        crossattn = maybe_drop(clip_emb, "cond_frames_without_noise", 0)

        if cfg.action_control:
            action_embs = []
            for i, (key, d) in enumerate(ACTION_SPECS):
                if key in batch:
                    emb = concat_timestep_embed(batch[key], ACTION_EMB_DIM)[:, None, :]
                    emb = maybe_drop(emb, key, 10 + i)
                else:
                    emb = jnp.zeros((b, 1, d * ACTION_EMB_DIM), dtype=crossattn.dtype)
                action_embs.append(emb)
            crossattn = jnp.concatenate([crossattn] + action_embs, axis=-1)
        out["crossattn"] = crossattn

        # --- vector: fps_id ++ motion_bucket_id ++ cond_aug sinusoidal embeds ---
        vec = jnp.concatenate(
            [
                maybe_drop(concat_timestep_embed(batch["fps_id"], cfg.vector_outdim), "fps_id", 1),
                maybe_drop(concat_timestep_embed(batch["motion_bucket_id"], cfg.vector_outdim),
                           "motion_bucket_id", 2),
                maybe_drop(concat_timestep_embed(batch["cond_aug"], cfg.vector_outdim),
                           "cond_aug", 3),
            ],
            axis=-1,
        )
        out["vector"] = vec

        # --- concat: VAE-encoded (mode) conditional frame latents ---
        cf = batch["cond_frames"]
        if skip_encode:
            latent = cf
        else:
            moments = self.cond_frames_encoder(cf)
            # The reference's cond-frame encoder is an AutoencoderKLModeOnly
            # (a *Legacy* engine) which applies a learned 1x1 quant_conv to the
            # moments (vwm/models/autoencoder.py:432-504) — the first-stage
            # engine does not. The encoder trunk is shared; this 1x1 conv is
            # the only extra parameter (identity at init).
            moments = self.quant_conv(moments)
            # The concat conditioning is the UNSCALED latent: the reference's
            # VideoPredictionEmbedderWithEncoder defaults scale_factor=1.0 and
            # no shipped config overrides it (modules.py:456,493-497;
            # configs/inference/vista.yaml:69-98). The rollout's skip_encode
            # path divides the sampler's scaled latents by scale_factor for
            # exactly this reason (sample_utils.py:343).
            latent = gaussian_mode(moments)
        out["concat"] = maybe_drop(latent, "cond_frames", 4)
        return out

    def conditional_pair(
        self,
        batch: Dict[str, Array],
        force_uc_zero: FrozenSet[str] = frozenset(),
        skip_encode: bool = False,
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """(c, uc) pair for sampling — counterpart of
        ``get_unconditional_conditioning`` (modules.py:163-180)."""
        c = self(batch, frozenset(), skip_encode)
        uc = self(batch, force_uc_zero, skip_encode)
        return c, uc
