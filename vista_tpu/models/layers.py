"""Shared network primitives (Flax linen, NHWC, TPU dtype policy).

Dtype policy: parameters live in float32; compute runs in a configurable
``dtype`` (bfloat16 on TPU); normalization statistics are always computed in
float32 (the reference forces fp32 GroupNorm the same way,
vwm/modules/diffusionmodules/util.py:214-216).
"""

from __future__ import annotations

import math
from typing import Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


def timestep_embedding(
    t: Array, dim: int, max_period: float = 10000.0, dtype=jnp.float32
) -> Array:
    """Sinusoidal embedding, ``cos`` half first then ``sin`` half.

    Ordering matters for checkpoint parity: the UNet/conditioner embedding in
    the reference concatenates ``(cos, sin)``
    (vwm/modules/diffusionmodules/util.py timestep_embedding), unlike the
    VAE-era ``(sin, cos)`` variant.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32 regardless of the activation dtype."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        groups = self.num_groups
        if x.shape[-1] % groups != 0:  # tiny test configs with < 32 channels
            groups = math.gcd(x.shape[-1], groups)
        out = nn.GroupNorm(
            num_groups=groups, epsilon=self.eps, dtype=jnp.float32,
            param_dtype=jnp.float32, name="norm",
        )(x.astype(jnp.float32))
        return out.astype(orig_dtype)


def dense(features: int, *, use_bias: bool = True, dtype=jnp.bfloat16, name=None,
          kernel_init=None, bias_init=None) -> nn.Dense:
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    if bias_init is not None:
        kwargs["bias_init"] = bias_init
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
                    name=name, **kwargs)


def conv(features: int, kernel: Union[int, Sequence[int]], *, stride=1, dtype=jnp.bfloat16,
         padding="SAME", name=None, kernel_init=None) -> nn.Conv:
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride,) * len(kernel)
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(features, kernel_size=tuple(kernel), strides=tuple(stride),
                   padding=padding, dtype=dtype, param_dtype=jnp.float32, name=name, **kwargs)


zero_init = nn.initializers.zeros_init()


class TimestepMLP(nn.Module):
    """Linear -> SiLU -> Linear time-embedding MLP (UNet ``time_embed`` shape)."""

    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = dense(self.out_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        x = dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class AlphaBlender(nn.Module):
    """Learned (sigmoid) or fixed scalar blend of spatial vs temporal branches.

    Counterpart of the reference AlphaBlender
    (vwm/modules/diffusionmodules/util.py:277-318). In this codebase all three
    strategies reduce to one scalar: "fixed" uses the raw alpha, "learned" /
    "learned_with_images" use sigmoid of a learned scalar (there is no
    image-only indicator in Vista).
    Blend: ``alpha * x_spatial + (1 - alpha) * x_temporal``.
    """

    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"

    @nn.compact
    def __call__(self, x_spatial: Array, x_temporal: Array) -> Array:
        if self.merge_strategy == "fixed":
            a = jnp.asarray(self.alpha, dtype=x_spatial.dtype)
        elif self.merge_strategy in ("learned", "learned_with_images"):
            mix = self.param("mix_factor", lambda k: jnp.asarray([self.alpha], jnp.float32))
            a = nn.sigmoid(mix[0]).astype(x_spatial.dtype)
        else:
            raise ValueError(f"unknown merge strategy {self.merge_strategy!r}")
        return a * x_spatial + (1.0 - a) * x_temporal
