"""UNet residual blocks and resampling layers (Flax, NHWC).

Behavioral counterpart of ``vwm/modules/diffusionmodules/openaimodel.py``
(ResBlock/Upsample/Downsample) and the VideoResBlock of
``vwm/modules/diffusionmodules/video_model.py:9-75``: a spatial residual
block followed by a temporal residual block whose conv has kernel
``(t, 1, 1)`` over ``(b, t, h, w, c)``, merged by a learned AlphaBlender.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from vista_tpu.models.layers import AlphaBlender, GroupNorm32, conv, dense, zero_init

Array = jnp.ndarray


class _AffineParams(nn.Module):
    """GroupNorm scale/bias params (same names/init as ``nn.GroupNorm``)."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(),
                       (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return s, b


class _GNParams(nn.Module):
    """Parameter-only stand-in for ``GroupNorm32`` (scope ``<name>/norm``)."""

    features: int

    @nn.compact
    def __call__(self):
        return _AffineParams(self.features, name="norm")()


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``TemporalConv`` (same kernel layout)."""

    features: int
    cin: int
    kernel: Tuple[int, int, int]
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kt, kh, kw = self.kernel
        k = self.param("kernel", self.kernel_init,
                       (kt, kh, kw, self.cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class _MixerParams(nn.Module):
    """Parameter-only stand-in for a learned ``AlphaBlender`` scope."""

    alpha: float

    @nn.compact
    def __call__(self):
        return self.param(
            "mix_factor", lambda k: jnp.asarray([self.alpha], jnp.float32))


def _conv_ndhwc(x5: Array, k: Array, bias: Array, dtype) -> Array:
    """General 3-D conv on ``(b, t, h, w, c)`` (the non-fused fallback)."""
    dn = jax.lax.conv_dimension_numbers(
        x5.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        x5.astype(dtype), k.astype(dtype), window_strides=(1, 1, 1),
        padding="SAME", dimension_numbers=dn)
    return y + bias.astype(dtype)


def _gn_affine(x5: Array, gamma: Array, beta: Array, eps: float = 1e-5):
    """Fold GroupNorm statistics of ``(b, t, h, w, c)`` into per-frame
    per-channel affine ``scale``/``shift`` (fp32, flax fast-variance math:
    ``var = E[x^2] - E[x]^2``), for the fused GN+SiLU+conv3 kernels.

    GroupNorm on the 5-D video tensor reduces over ``(t, h, w, c/G)`` — the
    WHOLE video, frame axis included (torch normalizes (C/G, T, H, W) per
    sample the same way; golden-parity pins this). The per-video affine is
    broadcast back to per-frame ``(b*t, c)`` rows so the kernels can
    zero-pad the edge frames' rows (padding maps to 0, silu(0) = 0)."""
    b, t, hh, ww, c = x5.shape
    groups = 32 if c % 32 == 0 else math.gcd(c, 32)
    xf = x5.astype(jnp.float32).reshape(b, t, hh * ww, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4))
    var = jnp.mean(xf * xf, axis=(1, 2, 4)) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)                     # (b, G)
    scg = jnp.repeat(rstd, c // groups, axis=-1)        # (b, c)
    mng = jnp.repeat(mean, c // groups, axis=-1)
    scale = scg * gamma
    shift = beta - mng * scale
    scale = jnp.broadcast_to(scale[:, None, :], (b, t, c))
    shift = jnp.broadcast_to(shift[:, None, :], (b, t, c))
    return scale.reshape(b * t, c), shift.reshape(b * t, c)


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
    ``(b, t, h, w, c)``. Vista ships ``video_kernel_size = [3, 1, 1]``.

    On TPU-friendly shapes the whole chain — GN, SiLU, 3-tap conv, the
    per-frame emb bias, the second GN/SiLU/conv, the residual add, and
    (when ``blend_alpha`` is given) the AlphaBlender collapse
    ``a*x + (1-a)*(x+h) = x + (1-a)*h`` — runs as two fused Pallas passes
    (``ops/temporal_conv.fused_gn_silu_conv3_*``); only the GroupNorm
    statistics reductions stay in XLA. The parameter tree is identical to
    the module-by-module fallback path.
    """

    out_channels: int
    emb_channels: int
    kernel: Tuple[int, int, int] = (3, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    use_emb: bool = True

    @nn.compact
    def __call__(self, x: Array, emb: Optional[Array],
                 blend_alpha: Optional[Array] = None) -> Array:
        # x: (b, t, h, w, c); emb: (b, t, emb_channels) or None;
        # blend_alpha: optional () spatial-blend weight ``a`` — when given,
        # returns the blended ``a*x + (1-a)*(x + h)`` directly.
        import vista_tpu.ops.temporal_conv as _tc
        from vista_tpu.ops.temporal_conv import (
            fused_gn_silu_conv3_emb,
            fused_gn_silu_conv3_res,
            temporal_conv3,
            temporal_conv3_supported,
        )

        b, t, hh, ww, cin = x.shape
        cout = self.out_channels
        g1, be1 = _GNParams(cin, name="in_norm")()
        k1, b1 = _ConvParams(cout, cin, self.kernel, name="in_conv")()
        e = None
        if self.use_emb and emb is not None:
            e = dense(cout, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        g2, be2 = _GNParams(cout, name="out_norm")()
        k2, b2 = _ConvParams(cout, cout, self.kernel, kernel_init=zero_init,
                             name="out_conv")()

        s = hh * ww
        fused = (_tc._FUSED_GN and self.kernel == (3, 1, 1) and cin == cout
                 and (jax.default_backend() == "tpu" or _tc._FUSED_GN_ON_CPU)
                 and temporal_conv3_supported(s, cin, cout))
        res_scale = jnp.asarray(1.0, jnp.float32)
        if blend_alpha is not None:
            res_scale = 1.0 - blend_alpha.astype(jnp.float32)

        if fused:
            xf = x.reshape(b * t, s, cin)
            sc1, sh1 = _gn_affine(x, g1, be1)
            e2 = (e.reshape(b * t, cout) if e is not None
                  else jnp.zeros((b * t, cout), jnp.float32))
            h = fused_gn_silu_conv3_emb(
                xf, sc1, sh1, k1.reshape(3, cin, cout), b1, e2, t)
            sc2, sh2 = _gn_affine(h.reshape(b, t, hh, ww, cout), g2, be2)
            out = fused_gn_silu_conv3_res(
                h, sc2, sh2, k2.reshape(3, cout, cout), b2, xf, res_scale, t)
            return out.reshape(b, t, hh, ww, cout)

        # non-fused path (any kernel/shape, and the --fused-gn off A/B
        # baseline): same params, XLA elementwise + the plain conv kernel
        def conv3(h5, k, bias):
            ci, co = h5.shape[-1], k.shape[-1]
            if (self.kernel == (3, 1, 1)
                    and jax.default_backend() == "tpu"
                    and temporal_conv3_supported(s, ci, co)):
                y = temporal_conv3(
                    h5.reshape(b * t, s, ci).astype(self.dtype),
                    k.reshape(3, ci, co), bias, t)
                return y.reshape(b, t, hh, ww, co)
            return _conv_ndhwc(h5, k, bias, self.dtype)

        sc1, sh1 = _gn_affine(x, g1, be1)
        h = nn.silu(x.astype(jnp.float32)
                    * sc1.reshape(b, t, 1, 1, cin)
                    + sh1.reshape(b, t, 1, 1, cin)).astype(self.dtype)
        h = conv3(h, k1, b1)
        if e is not None:
            h = h + e[:, :, None, None, :].astype(h.dtype)
        sc2, sh2 = _gn_affine(h, g2, be2)
        h2 = nn.silu(h.astype(jnp.float32)
                     * sc2.reshape(b, t, 1, 1, cout)
                     + sh2.reshape(b, t, 1, 1, cout)).astype(self.dtype)
        h2 = conv3(h2, k2, b2)
        return (x.astype(jnp.float32)
                + res_scale * h2.astype(jnp.float32)).astype(x.dtype)


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
        # the AlphaBlender collapses into the temporal block's fused
        # epilogue: a*x + (1-a)*(x + h) = x + (1-a)*h (same param scope)
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.merge_factor, jnp.float32)
        elif self.merge_strategy in ("learned", "learned_with_images"):
            mix = _MixerParams(self.merge_factor, name="time_mixer")()
            alpha = nn.sigmoid(mix[0])
        else:
            raise ValueError(f"unknown merge strategy {self.merge_strategy!r}")
        x_v = TemporalResBlock(self.out_channels, self.emb_channels, self.video_kernel,
                               dtype=self.dtype, name="time_stack")(x_v, emb_v, alpha)
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
