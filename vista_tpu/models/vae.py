"""Image VAE (SD-style) with Vista's temporal video decoder (Flax, NHWC).

Behavioral counterpart of ``vwm/modules/diffusionmodules/model.py``
(Encoder/Decoder, ch=128, ch_mult [1,2,4,4], 8x spatial downsample to 4
latent channels, ~84M params) and
``vwm/modules/autoencoding/temporal_ae.py`` (VideoDecoder, time_mode
"conv-only": every ResnetBlock gains a ``(3,1,1)`` temporal conv branch with
a learned alpha blend, and the final conv gains a 3-D ``time_mix_conv``).

The diagonal-Gaussian regularizer (vwm/modules/autoencoding/regularizers,
vwm/modules/distributions/distributions.py) is expressed as pure functions
over the encoder's ``2*z`` moment output: ``gaussian_sample`` (first stage,
sample=True) and ``gaussian_mode`` (the conditioner's AutoencoderKLModeOnly).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vista_tpu.models.layers import GroupNorm32, conv
from vista_tpu.ops.attention import attention_packed

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 4
    double_z: bool = True
    video_kernel: Tuple[int, int, int] = (3, 1, 1)
    scale_factor: float = 0.18215
    dtype: str = "bfloat16"
    # mid-block attention kind, the make_attn switch (reference
    # model.py:244-271): "vanilla" (shipped) | "linear" | "none"
    attn_type: str = "vanilla"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    def tiny(self) -> "VAEConfig":
        return dataclasses.replace(self, ch=16, ch_mult=(1, 2), num_res_blocks=1)


class VAEResnetBlock(nn.Module):
    """GN(eps 1e-6) - swish - conv - GN - swish - conv, 1x1-conv shortcut."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        h = GroupNorm32(eps=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = conv(self.out_channels, 1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over the spatial tokens (mid-block).

    Backend note: XLA's softmax fusion streams the (chunk, 9216, 9216)
    logits without materializing them, and the Pallas flash path's row-major
    operand constraints force (chunk, 9216, 512) relayout copies that pushed
    the 576x1024 decode over the 16 GB HBM budget (measured) — so this stays
    on the XLA path."""

    dtype: jnp.dtype = jnp.bfloat16
    backend: str = "xla"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = GroupNorm32(eps=1e-6, name="norm")(x)
        q = conv(c, 1, dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = conv(c, 1, dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = conv(c, 1, dtype=self.dtype, name="v")(y).reshape(b, h * w, c)
        out = attention_packed(q, k, v, num_heads=1, backend=self.backend)
        out = conv(c, 1, dtype=self.dtype, name="proj_out")(out.reshape(b, h, w, c))
        return x + out


class VAELinearAttnBlock(nn.Module):
    """Single-head linear attention (reference LinAttnBlock,
    model.py:138-144 -> attention.py:145-163): k-softmax over tokens,
    ``out = (k_softmax vᵀ) q`` with 1x1 convs and NO residual add (the
    reference block inherits LinearAttention.forward unchanged). Not in any
    shipped config — kept for make_attn parity (``attn_type: linear``)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        qkv = nn.Conv(3 * c, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, c)
        # (b, c, n) each, matching the reference's "b (qkv heads c) (h w)"
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1) for i in range(3))
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1).astype(self.dtype)
        context = jnp.einsum("bdn,ben->bde", k, v)
        out = jnp.einsum("bde,bdn->ben", context, q)
        out = out.transpose(0, 2, 1).reshape(b, h, w, c)
        return nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="to_out")(out)


def make_attn(attn_type: str, dtype, name: str):
    """The reference's mid-block attention switch (model.py:244-271).
    "vanilla" and "vanilla-xformers" are the same math there (SDPA vs
    xformers memory-efficient kernels) and map to one block here."""
    if attn_type in ("vanilla", "vanilla-xformers"):
        return VAEAttnBlock(dtype=dtype, name=name)
    if attn_type == "linear":
        return VAELinearAttnBlock(dtype=dtype, name=name)
    if attn_type == "none":
        return lambda x: x
    raise ValueError(f"attn_type `{attn_type}` unknown")


class VAEDownsample(nn.Module):
    """Stride-2 conv with asymmetric (right/bottom) padding, torch-parity."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        return nn.Conv(c, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class VAEUpsample(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        # nearest-2x as broadcast+reshape: identical to
        # jax.image.resize(method="nearest") but lowers to a plain copy
        # instead of a gather (the resize ran at ~348 GB/s in the decode
        # profile — half of HBM peak)
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, h * 2, w * 2, c)
        return conv(c, 3, dtype=self.dtype, name="conv")(x)


class VAEEncoder(nn.Module):
    """Pixels ``(b, h, w, 3)`` -> Gaussian moments ``(b, h/8, w/8, 2*z)``."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        x = x.astype(dtype)
        h = conv(cfg.ch, 3, dtype=dtype, name="conv_in")(x)
        for level, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = VAEResnetBlock(cfg.ch * mult, dtype=dtype, name=f"down_{level}_block_{i}")(h)
            if level != len(cfg.ch_mult) - 1:
                h = VAEDownsample(dtype=dtype, name=f"down_{level}_downsample")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=dtype, name="mid_block_1")(h)
        h = make_attn(cfg.attn_type, dtype, "mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=dtype, name="mid_block_2")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return conv(out_ch, 3, dtype=dtype, name="conv_out")(h).astype(jnp.float32)


class VAEDecoder(nn.Module):
    """Latents ``(b, h/8, w/8, z)`` -> pixels ``(b, h, w, 3)`` (image decoder)."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        z = z.astype(dtype)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = conv(block_in, 3, dtype=dtype, name="conv_in")(z)
        h = VAEResnetBlock(block_in, dtype=dtype, name="mid_block_1")(h)
        h = make_attn(cfg.attn_type, dtype, "mid_attn_1")(h)
        h = VAEResnetBlock(block_in, dtype=dtype, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(ch, dtype=dtype, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                h = VAEUpsample(dtype=dtype, name=f"up_{level}_upsample")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return conv(cfg.out_channels, 3, dtype=dtype, name="conv_out")(h).astype(jnp.float32)


class VideoResnetBlock(nn.Module):
    """VAE ResnetBlock + temporal ``(3,1,1)`` conv branch, learned scalar blend.

    Counterpart of temporal_ae.py VideoResBlock: blend is
    ``alpha * x_temporal + (1 - alpha) * x_spatial`` with alpha =
    sigmoid(learned scalar) initialized at 0 (alpha=0.5 effective at init).
    """

    out_channels: int
    video_kernel: Tuple[int, int, int] = (3, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, num_frames: int) -> Array:
        x = VAEResnetBlock(self.out_channels, dtype=self.dtype, name="spatial")(x)
        bt, h, w, c = x.shape
        b = bt // num_frames
        x_v = x.reshape(b, num_frames, h, w, c)
        t = GroupNorm32(name="ts_in_norm")(x_v)
        t = nn.silu(t)
        t = nn.Conv(c, self.video_kernel, padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="ts_in_conv")(t)
        t = GroupNorm32(name="ts_out_norm")(t)
        t = nn.silu(t)
        t = nn.Conv(c, self.video_kernel, padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="ts_out_conv",
                    kernel_init=nn.initializers.zeros_init())(t)
        x_t = x_v + t
        mix = self.param("mix_factor", lambda k: jnp.zeros((1,), jnp.float32))
        alpha = nn.sigmoid(mix[0]).astype(x.dtype)
        out = alpha * x_t + (1.0 - alpha) * x_v
        return out.reshape(bt, h, w, c)


class VideoVAEDecoder(nn.Module):
    """Temporal video decoder: VAEDecoder with temporal conv branches.

    Takes frame-major latents ``(b*t, h/8, w/8, z)`` plus ``num_frames``.
    """

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z: Array, num_frames: int) -> Array:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        z = z.astype(dtype)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = conv(block_in, 3, dtype=dtype, name="conv_in")(z)
        h = VideoResnetBlock(block_in, cfg.video_kernel, dtype=dtype, name="mid_block_1")(h, num_frames)
        h = make_attn(cfg.attn_type, dtype, "mid_attn_1")(h)
        h = VideoResnetBlock(block_in, cfg.video_kernel, dtype=dtype, name="mid_block_2")(h, num_frames)
        for level in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = VideoResnetBlock(ch, cfg.video_kernel, dtype=dtype,
                                     name=f"up_{level}_block_{i}")(h, num_frames)
            if level != 0:
                h = VAEUpsample(dtype=dtype, name=f"up_{level}_upsample")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        # AE3DConv: 2-D conv then a 3-D time-mix conv (temporal_ae.py:75-97)
        h = conv(cfg.out_channels, 3, dtype=dtype, name="conv_out")(h)
        bt, hh, ww, c = h.shape
        b = bt // num_frames
        h = h.reshape(b, num_frames, hh, ww, c)
        h = nn.Conv(c, cfg.video_kernel, padding="SAME", dtype=dtype,
                    param_dtype=jnp.float32, name="time_mix_conv")(h)
        return h.reshape(bt, hh, ww, c).astype(jnp.float32)


# --- diagonal Gaussian regularizer as pure functions ---

def gaussian_split(moments: Array) -> Tuple[Array, Array]:
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def gaussian_sample(moments: Array, key: jax.Array) -> Array:
    mean, logvar = gaussian_split(moments)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)


def gaussian_mode(moments: Array) -> Array:
    mean, _ = gaussian_split(moments)
    return mean


def gaussian_kl(moments: Array) -> Array:
    """KL(q || N(0, I)) per example (summed over latent dims)."""
    mean, logvar = gaussian_split(moments)
    var = jnp.exp(logvar)
    kl = 0.5 * (mean**2 + var - 1.0 - logvar)
    return kl.reshape(kl.shape[0], -1).sum(axis=-1)
