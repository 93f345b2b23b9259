"""UNet residual blocks and resampling layers (Flax, NHWC).

Behavioral counterpart of ``vwm/modules/diffusionmodules/openaimodel.py``
(ResBlock/Upsample/Downsample) and the VideoResBlock of
``vwm/modules/diffusionmodules/video_model.py:9-75``: a spatial residual
block followed by a temporal residual block whose conv has kernel
``(t, 1, 1)`` over ``(b, t, h, w, c)``, merged by a learned AlphaBlender.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from vista_tpu.models.layers import AlphaBlender, GroupNorm32, conv, dense, zero_init

Array = jnp.ndarray


class ResBlock(nn.Module):
    """Spatial residual block: GN-SiLU-conv, +time-emb, GN-SiLU-zeroconv, skip."""

    out_channels: int
    emb_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, emb: Optional[Array]) -> Array:
        in_ch = x.shape[-1]
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="in_conv")(h)

        if emb is not None:
            e = dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
            h = h + e[:, None, None, :]

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="out_conv",
                 kernel_init=zero_init)(h)

        if in_ch != self.out_channels:
            x = conv(self.out_channels, 1, dtype=self.dtype, name="skip_conv")(x)
        return x + h


class TemporalConv(nn.Module):
    """Conv over the frame axis of ``(b, t, h, w, c)``.

    Param layout is identical to ``nn.Conv`` (kernel ``(kt, kh, kw, cin,
    cout)`` + bias) so checkpoint key maps are unchanged. On TPU the shipped
    ``(3, 1, 1)`` kernel routes to the frame-major packed-matmul op
    (``ops/temporal_conv.py``) — the XLA 3-D conv lays the CFG batch (2) on
    the sublane axis and idles 3/4 of the MXU (measured 50 TF/s, ~95ms/eval
    at 576x1024); the packed form runs one (M,c)x(c,3c) matmul + shift."""

    features: int
    kernel: Tuple[int, int, int]
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kt, kh, kw = self.kernel
        b, t, h, w, cin = x.shape
        k = self.param("kernel", self.kernel_init,
                       (kt, kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)

        from vista_tpu.ops.temporal_conv import (temporal_conv3,
                                                 temporal_conv3_supported)

        if ((kt, kh, kw) == (3, 1, 1) and jax.default_backend() == "tpu"
                and temporal_conv3_supported(h * w, cin, self.features)):
            y = temporal_conv3(x.reshape(b * t, h * w, cin).astype(self.dtype),
                               k.reshape(3, cin, self.features), bias, t)
            return y.reshape(b, t, h, w, self.features)

        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 1, 1), padding="SAME", dimension_numbers=dn)
        return y + bias.astype(self.dtype)


class TemporalResBlock(nn.Module):
    """Residual block convolving the frame axis: kernel ``(kt, kh, kw)`` on
    ``(b, t, h, w, c)``. Vista ships ``video_kernel_size = [3, 1, 1]``."""

    out_channels: int
    emb_channels: int
    kernel: Tuple[int, int, int] = (3, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    use_emb: bool = True

    @nn.compact
    def __call__(self, x: Array, emb: Optional[Array]) -> Array:
        # x: (b, t, h, w, c); emb: (b, t, emb_channels) or None
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        h = TemporalConv(self.out_channels, self.kernel, dtype=self.dtype,
                         name="in_conv")(h)

        if self.use_emb and emb is not None:
            e = dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
            h = h + e[:, :, None, None, :]

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = TemporalConv(self.out_channels, self.kernel, dtype=self.dtype,
                         name="out_conv", kernel_init=zero_init)(h)
        return x + h


class VideoResBlock(nn.Module):
    """Spatial ResBlock + temporal ResBlock + learned alpha blend.

    Input/output are frame-major NHWC ``(b*t, h, w, c)``; the temporal branch
    views them as ``(b, t, h, w, c)``.
    """

    out_channels: int
    emb_channels: int
    video_kernel: Tuple[int, int, int] = (3, 1, 1)
    merge_factor: float = 0.5
    merge_strategy: str = "learned_with_images"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, emb: Array, num_frames: int) -> Array:
        x = ResBlock(self.out_channels, self.emb_channels, dtype=self.dtype, name="spatial")(x, emb)

        bt, h, w, c = x.shape
        b = bt // num_frames
        x_v = x.reshape(b, num_frames, h, w, c)
        emb_v = emb.reshape(b, num_frames, emb.shape[-1])
        x_t = TemporalResBlock(self.out_channels, self.emb_channels, self.video_kernel,
                               dtype=self.dtype, name="time_stack")(x_v, emb_v)
        x_v = AlphaBlender(self.merge_factor, self.merge_strategy, name="time_mixer")(x_v, x_t)
        return x_v.reshape(bt, h, w, c)


class Upsample(nn.Module):
    """2x nearest upsample + 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return conv(self.out_channels, 3, dtype=self.dtype, name="conv")(x)


class Downsample(nn.Module):
    """3x3 stride-2 conv downsample (explicit (1,1) padding, torch-parity)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return conv(self.out_channels, 3, stride=2, dtype=self.dtype,
                    padding=((1, 1), (1, 1)), name="conv")(x)
