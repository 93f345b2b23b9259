"""The Vista spatiotemporal VideoUNet (Flax, NHWC, frame-major batch).

Behavioral counterpart of ``vwm/modules/diffusionmodules/video_model.py``
(the SVD-XT UNet with Vista's additions). Shipped shape
(configs/inference/vista.yaml:18-40): model_channels 320, channel_mult
[1,2,4,4], num_res_blocks 2, attention at downsample ratios {1,2,4},
head_dim 64, context_dim 1024 (+2432 action dims when action_control),
adm_in_channels 768, in 8 channels (4 noised + 4 concat-cond latents),
out 4 — about 1.5 B parameters.

Vista-specific behaviors reproduced:
- dual time-embedding MLPs ``time_embed`` and ``cond_time_stack_embed``
  blended per-frame by the conditional-frame mask (video_model.py:148-157,
  456-461) so pinned context frames (sigma=0) get their own embedding;
- every level interleaves VideoResBlocks (spatial + temporal conv) with
  SpatialVideoTransformers (spatial + temporal attention);
- per-video conditioning (CLIP context, ADM vector) is broadcast to
  per-frame inside the model when needed (video_model.py:463-474).

TPU-first: NHWC layout, bf16 compute / fp32 params & norms, optional
``jax.checkpoint`` (remat) around each top-level block for training, and the
attention backend is switchable to the Pallas flash kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vista_tpu.models.attention import SpatialVideoTransformer
from vista_tpu.models.blocks import Downsample, Upsample, VideoResBlock
from vista_tpu.models.layers import GroupNorm32, TimestepMLP, conv, timestep_embedding, zero_init
from vista_tpu.utils.basic import repeat_as_img_seq

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class VideoUNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    transformer_depth: int = 1
    num_head_channels: int = 64
    context_dim: int = 1024
    adm_in_channels: int = 768
    video_kernel: Tuple[int, int, int] = (3, 1, 1)
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    add_lora: bool = False
    action_control: bool = False
    num_frames: int = 25
    attn_backend: str = "xla"
    dtype: str = "bfloat16"
    remat: bool = False  # jax.checkpoint each top-level block (training)
    # Selective checkpointing: when set, only blocks running at
    # downsample factor ds <= remat_max_ds are rematted; deeper blocks
    # (smaller activations) store their intermediates instead of
    # recomputing them in backward. None = remat every block. E.g.
    # remat_max_ds=2 stores the ds4/ds8 blocks (~1/3 of the per-block
    # activation footprint of a ds1 block) and skips ~37% of the
    # backward recompute. No effect unless remat=True.
    remat_max_ds: Optional[int] = None
    # Remat POLICY (jax.checkpoint checkpoint_policies), a finer lever than
    # the all-or-nothing block remat: inside rematted blocks, save the named
    # FLOPs-heavy op outputs and recompute only the cheap tail.
    #   None    = classic full block remat (save only block inputs)
    #   "names" = save the attention/FF kernel outputs tagged with
    #             jax.ad_checkpoint.checkpoint_name in models/attention.py
    #             (save_only_these_names) — skips recomputing the attention
    #             and feed-forward matmuls in backward at the cost of
    #             storing their (bt, s, c)-sized outputs
    #   "dots"  = XLA-chosen dots_with_no_batch_dims_saveable
    # No effect unless remat=True.
    remat_policy: Optional[str] = None

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def tiny(self) -> "VideoUNetConfig":
        """A small config for tests."""
        return dataclasses.replace(
            self, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1, 2), num_head_channels=16, context_dim=32,
            adm_in_channels=24, num_frames=4,
        )


class VideoUNet(nn.Module):
    """Flax VideoUNet. Call: ``unet(x, t, context, y, cond_mask, num_frames)``.

    x: ``(b*t, h, w, in_channels)`` noised+concat latents (NHWC).
    t: ``(b*t,)`` noise conditioning (c_noise).
    context: ``(b or b*t, s, context_dim[+action])`` cross-attn tokens.
    y: ``(b or b*t, adm_in_channels)`` ADM vector conditioning.
    cond_mask: ``(b*t,)`` 0/1 conditional-frame mask (or None).
    """

    cfg: VideoUNetConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: Array,
        context: Optional[Array] = None,
        y: Optional[Array] = None,
        cond_mask: Optional[Array] = None,
        num_frames: Optional[int] = None,
    ) -> Array:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        nf = num_frames or cfg.num_frames
        bt = x.shape[0]
        ch0 = cfg.model_channels
        emb_ch = ch0 * 4

        x = x.astype(dtype)

        # --- time embedding, blended between the two MLPs by cond_mask ---
        t_emb = timestep_embedding(t, ch0, dtype=dtype)
        emb_uncond = TimestepMLP(emb_ch, dtype=dtype, name="time_embed")(t_emb)
        if cond_mask is not None:
            emb_cond = TimestepMLP(emb_ch, dtype=dtype, name="cond_time_stack_embed")(t_emb)
            m = cond_mask.astype(dtype)[:, None]
            emb = emb_cond * m + emb_uncond * (1.0 - m)
        else:
            emb = emb_uncond

        # --- per-video -> per-frame broadcast of context / y ---
        if context is not None and context.shape[0] != bt:
            context = repeat_as_img_seq(context, nf)
        if y is not None:
            if y.shape[0] != bt:
                y = repeat_as_img_seq(y, nf)
            emb = emb + TimestepMLP(emb_ch, dtype=dtype, name="label_emb")(y.astype(dtype))
        if context is not None:
            context = context.astype(dtype)

        # activation checkpointing (reference use_checkpoint on ResBlocks and
        # transformer blocks, openaimodel.py:253-256 / attention.py:507-510):
        # remat each top-level block so backward recomputes instead of storing.
        # remat_max_ds gates it by downsample factor: blocks deeper than the
        # threshold store their intermediates (small activations, recompute
        # not worth it).
        policy = None
        if cfg.remat_policy == "names":
            import jax

            policy = jax.checkpoint_policies.save_only_these_names(
                "attn1_out", "attn2_out", "ff_out", "temporal_attn_out")
        elif cfg.remat_policy == "dots":
            import jax

            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif cfg.remat_policy is not None:
            raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
        remat_res_cls = nn.remat(VideoResBlock, static_argnums=(3,), policy=policy)
        remat_attn_cls = nn.remat(SpatialVideoTransformer, static_argnums=(3,),
                                  policy=policy)

        def block_classes(ds):
            use = cfg.remat and (cfg.remat_max_ds is None
                                 or ds <= cfg.remat_max_ds)
            if use:
                return remat_res_cls, remat_attn_cls
            return VideoResBlock, SpatialVideoTransformer

        def attn(ch, name, attn_cls):
            heads = ch // cfg.num_head_channels
            ctx_dim = cfg.context_dim
            return attn_cls(
                channels=ch, heads=heads, dim_head=cfg.num_head_channels,
                depth=cfg.transformer_depth, context_dim=ctx_dim,
                merge_factor=cfg.merge_factor, merge_strategy=cfg.merge_strategy,
                add_lora=cfg.add_lora, action_control=cfg.action_control,
                backend=cfg.attn_backend, dtype=dtype, name=name,
            )

        # --- encoder ---
        h = conv(ch0, 3, dtype=dtype, name="conv_in")(x)
        hs = [h]
        ch = ch0
        ds = 1
        skip_chs = [ch]
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = mult * ch0
                res_cls, attn_cls = block_classes(ds)
                h = res_cls(ch, emb_ch, cfg.video_kernel, cfg.merge_factor,
                                  cfg.merge_strategy, dtype=dtype,
                                  name=f"down_{level}_{i}_res")(h, emb, nf)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"down_{level}_{i}_attn", attn_cls)(h, context, nf)
                hs.append(h)
                skip_chs.append(ch)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, dtype=dtype, name=f"down_{level}_downsample")(h)
                ds *= 2
                hs.append(h)
                skip_chs.append(ch)

        # --- middle (runs at the deepest ds) ---
        res_cls, attn_cls = block_classes(ds)
        h = res_cls(ch, emb_ch, cfg.video_kernel, cfg.merge_factor,
                          cfg.merge_strategy, dtype=dtype, name="mid_res1")(h, emb, nf)
        h = attn(ch, "mid_attn", attn_cls)(h, context, nf)
        h = res_cls(ch, emb_ch, cfg.video_kernel, cfg.merge_factor,
                          cfg.merge_strategy, dtype=dtype, name="mid_res2")(h, emb, nf)

        # --- decoder ---
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                skip_chs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = mult * ch0
                res_cls, attn_cls = block_classes(ds)
                h = res_cls(ch, emb_ch, cfg.video_kernel, cfg.merge_factor,
                                  cfg.merge_strategy, dtype=dtype,
                                  name=f"up_{level}_{i}_res")(h, emb, nf)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"up_{level}_{i}_attn", attn_cls)(h, context, nf)
                if level != 0 and i == cfg.num_res_blocks:
                    h = Upsample(ch, dtype=dtype, name=f"up_{level}_upsample")(h)
                    ds //= 2

        # --- head ---
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = conv(cfg.out_channels, 3, dtype=dtype, name="conv_out", kernel_init=zero_init)(h)
        return h.astype(jnp.float32)
