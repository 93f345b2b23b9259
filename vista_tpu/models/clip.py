"""OpenCLIP-style vision transformer (ViT-H/14 visual tower) in Flax.

Behavioral counterpart of the reference's ``FrozenOpenCLIPImageEmbedder``
(vwm/modules/encoders/modules.py:251-399): the laion2b ViT-H/14 visual trunk
(~632M params, frozen) producing a single 1024-d image embedding per frame.
Preprocessing matches modules.py:298-310 — resize to 224 bicubic+antialias,
map [-1,1] -> [0,1], then CLIP mean/std normalization.

TPU notes: tokens are ``(b, 257, 1280)``; everything is big dense matmuls
that map directly onto the MXU. The tower is frozen, so in training it runs
under ``stop_gradient`` outside the grad pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vista_tpu.models.layers import dense
from vista_tpu.ops.attention import dot_product_attention

Array = jnp.ndarray

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    output_dim: int = 1024
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def tiny(self) -> "CLIPVisionConfig":
        return dataclasses.replace(self, image_size=28, patch_size=14, width=32,
                                   layers=2, heads=2, output_dim=16)


def clip_preprocess(frames: Array, image_size: int = 224) -> Array:
    """``[-1,1]`` NHWC frames -> CLIP-normalized ``(b, S, S, 3)``."""
    b = frames.shape[0]
    x = jax.image.resize(frames, (b, image_size, image_size, 3), method="bicubic",
                         antialias=True)
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, dtype=x.dtype)
    std = jnp.asarray(CLIP_STD, dtype=x.dtype)
    return (x - mean) / std


class CLIPLayerNorm(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                           name="ln")(x.astype(jnp.float32))
        return out.astype(x.dtype)


class CLIPAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.bfloat16
    causal: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, s, d = x.shape
        dh = d // self.heads
        qkv = dense(3 * d, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.heads, dh)
        k = k.reshape(b, s, self.heads, dh)
        v = v.reshape(b, s, self.heads, dh)
        out = dot_product_attention(q, k, v, causal=self.causal).reshape(b, s, d)
        return dense(d, dtype=self.dtype, name="out_proj")(out)


def _quick_gelu(x: Array) -> Array:
    """OpenAI CLIP's activation: x * sigmoid(1.702 x) (the openai/ text and
    vision checkpoints use this; laion2b ViT-H uses exact GELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.bfloat16
    act: str = "gelu"
    causal: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        x = x + CLIPAttention(self.heads, dtype=self.dtype, causal=self.causal,
                              name="attn")(CLIPLayerNorm(name="ln_1")(x))
        h = CLIPLayerNorm(name="ln_2")(x)
        h = dense(d * 4, dtype=self.dtype, name="mlp_fc")(h)
        h = _quick_gelu(h) if self.act == "quick_gelu" else nn.gelu(h, approximate=False)
        h = dense(d, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """ViT visual trunk; input CLIP-normalized ``(b, S, S, 3)``, output ``(b, output_dim)``."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        x = x.astype(dtype)
        grid = cfg.image_size // cfg.patch_size

        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, grid * grid, cfg.width)

        cls = self.param("class_embedding", nn.initializers.normal(cfg.width**-0.5),
                         (cfg.width,), jnp.float32)
        pos = self.param("positional_embedding", nn.initializers.normal(cfg.width**-0.5),
                         (grid * grid + 1, cfg.width), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(dtype), (b, 1, cfg.width)), x], axis=1)
        x = x + pos.astype(dtype)[None]

        x = CLIPLayerNorm(name="ln_pre")(x)
        for i in range(cfg.layers):
            x = CLIPBlock(cfg.heads, dtype=dtype, name=f"block_{i}")(x)
        x = CLIPLayerNorm(name="ln_post")(x[:, 0])

        proj = self.param("proj", nn.initializers.normal(cfg.width**-0.5),
                          (cfg.width, cfg.output_dim), jnp.float32)
        return (x @ proj.astype(dtype)).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """openai/clip-vit-large-patch14 text trunk (the reference's
    FrozenCLIPEmbedder, modules.py:183-248 — present in the reference API
    surface though absent from shipped Vista configs)."""

    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_length: int = 77
    act: str = "quick_gelu"
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def tiny(self) -> "CLIPTextConfig":
        return dataclasses.replace(self, vocab_size=128, width=32, layers=2, heads=2,
                                   max_length=16)


class CLIPTextTower(nn.Module):
    """Causal CLIP text transformer over token ids ``(b, L)``.

    Returns ``(last_hidden_state (b, L, width), pooled (b, width))`` —
    the reference's ``layer="last"`` output plus the EOT-pooled embedding
    (``layer="pooled"``). Tokenization stays host-side (the reference uses
    HF's CLIPTokenizer; pass its ``input_ids`` here). The EOT position is
    ``argmax(tokens)`` — the EOT id is the largest in CLIP's vocabulary,
    matching HF's pooling rule.
    """

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, tokens: Array) -> Tuple[Array, Array]:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        b, s = tokens.shape

        emb = nn.Embed(cfg.vocab_size, cfg.width, param_dtype=jnp.float32,
                       name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.max_length, cfg.width), jnp.float32)
        x = (emb + pos[None, :s]).astype(dtype)

        for i in range(cfg.layers):
            x = CLIPBlock(cfg.heads, dtype=dtype, act=cfg.act, causal=True,
                          name=f"block_{i}")(x)
        x = CLIPLayerNorm(name="ln_final")(x)

        pooled = x[jnp.arange(b), jnp.argmax(tokens, axis=-1)]
        return x.astype(jnp.float32), pooled.astype(jnp.float32)
