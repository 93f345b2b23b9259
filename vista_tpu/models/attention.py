"""Transformer blocks of the spatiotemporal UNet (Flax).

Behavioral counterpart of ``vwm/modules/attention.py`` and
``vwm/modules/video_attention.py``:

- ``CrossAttention``: q/k/v/out projections with optional rank-16 LoRA
  adapters (zero-init up, attention.py:294-316) and optional *action-control*
  adapters — the cross-attention context carries ``128*19 = 2432`` extra
  feature dims beyond ``context_dim`` that are split off and added to K/V
  through zero-init linears (attention.py:318-324,341-353);
- ``TransformerBlock``: pre-LN self-attn -> cross-attn -> GEGLU FF
  (BasicTransformerBlock, attention.py:424-524);
- ``TemporalTransformerBlock``: attention over the ``t``-frame axis per
  spatial location, with optional input FF (VideoTransformerBlock,
  video_attention.py:12-144);
- ``SpatialVideoTransformer``: interleaves spatial blocks with temporal
  blocks, adds a learned sinusoidal frame-position embedding, and merges via
  a learned AlphaBlender (video_attention.py:227-296).

TPU-first notes: the temporal rearrange ``(b t) s c -> (b s) t c`` is a pure
reshape/transpose fused by XLA; no 32768-row chunking is needed (that was an
xformers CUDA limit); softmax accumulates in fp32; LoRA/action adapters are
extra matmuls fused alongside the main projections.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from jax.ad_checkpoint import checkpoint_name

from vista_tpu.models.layers import AlphaBlender, GroupNorm32, dense, timestep_embedding, zero_init
from vista_tpu.ops.attention import attention_packed

Array = jnp.ndarray

# checkpoint_name tags below ("attn1_out"/"attn2_out"/"ff_out"/
# "temporal_attn_out") are identity ops unless the UNet runs with
# remat_policy="names" (save_only_these_names): then the rematted blocks
# store these FLOPs-heavy outputs and recompute only the cheap elementwise/
# norm tail in backward — the middle ground between full block remat and
# no remat (VideoUNetConfig.remat_policy).

ACTION_CONTEXT_DIM = 128 * 19  # five action modalities x 128-dim sinusoidal embeds


class _LNParams(nn.Module):
    """Parameter holder matching ``nn.LayerNorm``'s param tree exactly
    (checkpoint/key-map compatible)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics (torch-parity eps 1e-5).

    On TPU this runs as a one-pass Pallas kernel: XLA otherwise fuses the LN
    *into* the following q/k/v matmuls, which then rematerialize the
    normalization per tile and run at 16-43 TF/s instead of ~180 (measured,
    tools/xprof.py on the 576x1024 step). The kernel materializes the bf16
    normalized tensor once (1 read + 1 write) and keeps the matmuls clean.
    """

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale, bias = _LNParams(x.shape[-1], name="ln")()
        if jax.default_backend() == "tpu":
            from vista_tpu.ops.norms import layer_norm

            return layer_norm(x, scale, bias, eps=1e-5)
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                           name="ln_apply", use_scale=False, use_bias=False,
                           )(x.astype(jnp.float32))
        out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return out.astype(x.dtype)


class LoRAAdapter(nn.Module):
    """rank-r adapter: ``up(down(x)) * scale`` with zero-init up projection."""

    rank: int
    out_dim: int
    scale: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        down = dense(self.rank, use_bias=False, dtype=self.dtype, name="down",
                     kernel_init=nn.initializers.normal(1.0 / self.rank))(x)
        up = dense(self.out_dim, use_bias=False, dtype=self.dtype, name="up",
                   kernel_init=zero_init)(down)
        return up * self.scale


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when ``context`` is None."""

    heads: int
    dim_head: int
    query_dim: int
    context_dim: Optional[int] = None  # None -> self-attention
    add_lora: bool = False
    lora_rank: int = 16
    lora_scale: float = 1.0
    action_control: bool = False
    causal: bool = False
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context

        ctx_action = None
        if self.action_control:
            assert self.context_dim is not None
            ctx, ctx_action = ctx[..., : self.context_dim], ctx[..., self.context_dim:]

        # Single-token context fast path: Vista's conditioning context is ONE
        # token per video (CLIP image embed ++ action embeds), and softmax
        # over a single key is identically 1, so attention output == v for
        # EVERY query — the q/k projections and both attention matmuls are
        # mathematically dead. Compute to_out(to_v(ctx)) once per context row
        # and broadcast over queries (exact; autodiff likewise gives zero
        # grads to to_q/to_k through a one-logit softmax). The context batch
        # may be a divisor of the query batch (per-video context for b*h*w
        # temporal rows) — the OUTPUT is repeated, never the context.
        single_kv = (context is not None and ctx.shape[1] == 1
                     and not self.is_initializing())
        if single_kv:
            v = dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
            if self.add_lora:
                v = v + LoRAAdapter(self.lora_rank, inner, self.lora_scale, self.dtype,
                                    name="v_adapter")(ctx)
            if self.action_control:
                v = v + dense(inner, use_bias=False, dtype=self.dtype,
                              name="v_adapter_action", kernel_init=zero_init)(ctx_action)
            y = dense(self.query_dim, dtype=self.dtype, name="to_out")(v)
            if self.add_lora:
                y = y + LoRAAdapter(self.lora_rank, self.query_dim, self.lora_scale,
                                    self.dtype, name="out_adapter")(v)
            b_x, s_q = x.shape[0], x.shape[1]
            if y.shape[0] != b_x:
                assert b_x % y.shape[0] == 0, (y.shape, x.shape)
                y = jnp.repeat(y, b_x // y.shape[0], axis=0)
            return jnp.broadcast_to(y, (b_x, s_q, self.query_dim))

        # full path: a per-video context (batch divisor of the query batch)
        # must be repeated per row here; the fast path above avoids this by
        # repeating the OUTPUT instead
        if context is not None and ctx.shape[0] != x.shape[0]:
            reps = x.shape[0] // ctx.shape[0]
            ctx = jnp.repeat(ctx, reps, axis=0)
            if ctx_action is not None:
                ctx_action = jnp.repeat(ctx_action, reps, axis=0)

        q = dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        if self.add_lora:
            q = q + LoRAAdapter(self.lora_rank, inner, self.lora_scale, self.dtype, name="q_adapter")(x)
            k = k + LoRAAdapter(self.lora_rank, inner, self.lora_scale, self.dtype, name="k_adapter")(ctx)
            v = v + LoRAAdapter(self.lora_rank, inner, self.lora_scale, self.dtype, name="v_adapter")(ctx)

        if self.action_control:
            k = k + dense(inner, use_bias=False, dtype=self.dtype, name="k_adapter_action",
                          kernel_init=zero_init)(ctx_action)
            v = v + dense(inner, use_bias=False, dtype=self.dtype, name="v_adapter_action",
                          kernel_init=zero_init)(ctx_action)

        # packed layout throughout: the kernels slice heads via the grid, so
        # no (b, s, h, d) reshape / (b, h, s, d) transpose relayouts happen
        out = attention_packed(q, k, v, self.heads, backend=self.backend,
                               causal=self.causal)

        y = dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        if self.add_lora:
            y = y + LoRAAdapter(self.lora_rank, self.query_dim, self.lora_scale, self.dtype,
                                name="out_adapter")(out)
        return y


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward: ``Dense(d, 2*mult*d) -> x * gelu(gate) -> Dense``."""

    dim_out: int
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inner = int(x.shape[-1] * self.mult)
        proj = dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return dense(self.dim_out, dtype=self.dtype, name="proj_out")(h)


class _DenseParams(nn.Module):
    """Parameter holder matching ``nn.Dense``'s param tree exactly."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.out_dim), jnp.float32)
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
        return kernel, bias


class _LNScope(nn.Module):
    """``LayerNorm``-shaped param holder (<name>/ln/{scale,bias})."""

    features: int

    @nn.compact
    def __call__(self):
        return _LNParams(self.features, name="ln")()


class _SelfAttnParams(nn.Module):
    """``CrossAttention``(self, no adapters)-shaped param holder."""

    dim: int
    inner: int

    @nn.compact
    def __call__(self):
        wq, _ = _DenseParams(self.dim, self.inner, use_bias=False, name="to_q")()
        wk, _ = _DenseParams(self.dim, self.inner, use_bias=False, name="to_k")()
        wv, _ = _DenseParams(self.dim, self.inner, use_bias=False, name="to_v")()
        wo, bo = _DenseParams(self.inner, self.dim, name="to_out")()
        return wq, wk, wv, wo, bo


class _FFParams(nn.Module):
    """``GEGLUFeedForward``-shaped param holder."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        inner = self.dim * self.mult
        w1, b1 = _DenseParams(self.dim, inner * 2, name="proj_in")()
        w2, b2 = _DenseParams(inner, self.dim, name="proj_out")()
        return w1, b1, w2, b2


def pre_ln_geglu_ff(x: Array, dim: int, dtype, ln_name: str, ff_name: str,
                    backend: str) -> Array:
    """``x + FF(LN(x))`` — fused single-pass Pallas kernel on TPU (the
    2*4*c-wide proj_in output otherwise round-trips HBM between the two
    dots, ~6ms per ds1-sized FF), module composition elsewhere. Must be
    called inside a ``@nn.compact`` body; both paths declare identical
    param trees (<ln_name>/ln/*, <ff_name>/proj_{in,out}/*)."""
    from vista_tpu.ops.attention import resolve_backend
    from vista_tpu.ops.fused_ff import ff_input_supported, fused_geglu_ff

    c = x.shape[-1]
    if resolve_backend(backend) == "pallas" and ff_input_supported(x.shape) and dim == c:
        ln_s, ln_b = _LNScope(c, name=ln_name)()
        w1, b1, w2, b2 = _FFParams(dim, name=ff_name)()
        return checkpoint_name(fused_geglu_ff(x, ln_s, ln_b, w1, b1, w2, b2),
                               "ff_out")
    return x + checkpoint_name(GEGLUFeedForward(dim, dtype=dtype, name=ff_name)(
        LayerNorm(name=ln_name)(x)), "ff_out")


def pre_ln_self_attention(x: Array, heads: int, dim_head: int, dim: int,
                          dtype, add_lora: bool, ln_name: str, attn_name: str,
                          backend: str) -> Array:
    """``x + to_out(attn(to_qkv(LN(x))))`` — the q/k/v projections run as a
    single fused LN+QKV Pallas pass (1 read of x, VMEM-resident weights, no
    LN materialization) feeding the packed-layout attention kernel. Falls
    back to module composition off-TPU / with LoRA. Must be called inside a
    ``@nn.compact`` body; both paths declare identical param trees
    (<ln_name>/ln/*, <attn_name>/to_{q,k,v,out}/*)."""
    from vista_tpu.ops.attention import attention_packed, resolve_backend
    from vista_tpu.ops.fused_qkv import fused_ln_qkv, qkv_input_supported

    inner = heads * dim_head
    c = x.shape[-1]
    if (resolve_backend(backend) == "pallas" and not add_lora and dim == c
            and qkv_input_supported(x.shape, inner)):
        ln_s, ln_b = _LNScope(c, name=ln_name)()
        wq, wk, wv, wo, bo = _SelfAttnParams(c, inner, name=attn_name)()
        q, k, v = fused_ln_qkv(x, ln_s, ln_b, wq, wk, wv)
        o = checkpoint_name(attention_packed(q, k, v, heads, backend=backend),
                            "attn1_out")
        y = o @ wo.astype(o.dtype) + bo.astype(o.dtype)
        return x + y
    return x + checkpoint_name(CrossAttention(
        heads, dim_head, dim, context_dim=None, add_lora=add_lora,
        backend=backend, dtype=dtype, name=attn_name,
    )(LayerNorm(name=ln_name)(x)), "attn1_out")


class TransformerBlock(nn.Module):
    """Spatial block: pre-LN self-attn -> cross-attn(context) -> GEGLU FF."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    add_lora: bool = False
    action_control: bool = False
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        x = pre_ln_self_attention(
            x, self.heads, self.dim_head, self.dim, self.dtype, self.add_lora,
            "norm1", "attn1", self.backend)
        x = x + checkpoint_name(CrossAttention(
            self.heads, self.dim_head, self.dim, context_dim=self.context_dim,
            add_lora=self.add_lora, action_control=self.action_control,
            backend=self.backend, dtype=self.dtype, name="attn2",
        )(LayerNorm(name="norm2")(x), context=context), "attn2_out")
        x = pre_ln_geglu_ff(x, self.dim, self.dtype, "norm3", "ff", self.backend)
        return x


class _TemporalCore(nn.Module):
    """The temporal block body on ``(rows, t, c)``; scan-able over row chunks.

    Takes/returns a dummy carry so it composes with ``nn.scan`` (params
    broadcast across chunks — one set of weights, sequential application).
    """

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    ff_in: bool = True
    add_lora: bool = False
    action_control: bool = False
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    # real frame count when x carries sublane-padded frame slots
    valid_t: Optional[int] = None

    @nn.compact
    def __call__(self, carry, inputs):
        x, time_context = inputs
        if self.ff_in:
            x = pre_ln_geglu_ff(x, self.dim, self.dtype, "norm_in", "ff_in",
                                self.backend)

        from vista_tpu.ops.attention import resolve_backend
        from vista_tpu.ops.fused_temporal_attn import (
            fused_temporal_attn_supported,
            fused_temporal_self_attn,
        )

        inner = self.heads * self.dim_head
        if (resolve_backend(self.backend) == "pallas" and not self.add_lora
                and x.ndim == 3
                and fused_temporal_attn_supported(x.shape[1], self.dim, inner)):
            # one-pass LN + qkv + attention-over-t + out-proj + residual;
            # param tree identical to the composed path below. x may carry
            # sublane-padded frame slots (TemporalTransformerBlock pads
            # t=25 -> 32); valid_t masks their keys.
            ln_s, ln_b = _LNScope(self.dim, name="norm1")()
            wq, wk, wv, wo, bo = _SelfAttnParams(self.dim, inner, name="attn1")()
            x = checkpoint_name(
                fused_temporal_self_attn(x, ln_s, ln_b, wq, wk, wv, wo, bo,
                                         self.heads,
                                         self.valid_t or x.shape[1]),
                "temporal_attn_out")
        else:
            x = x + checkpoint_name(CrossAttention(
                self.heads, self.dim_head, self.dim, context_dim=None,
                add_lora=self.add_lora, backend=self.backend, dtype=self.dtype,
                name="attn1",
            )(LayerNorm(name="norm1")(x)), "temporal_attn_out")

        if time_context is not None or self.context_dim is not None:
            x = x + checkpoint_name(CrossAttention(
                self.heads, self.dim_head, self.dim, context_dim=self.context_dim,
                add_lora=self.add_lora, action_control=self.action_control,
                backend=self.backend, dtype=self.dtype, name="attn2",
            )(LayerNorm(name="norm2")(x), context=time_context), "attn2_out")

        x = pre_ln_geglu_ff(x, self.dim, self.dtype, "norm3", "ff", self.backend)
        return carry, x


class TemporalTransformerBlock(nn.Module):
    """Temporal block over the frame axis: tokens are the ``t`` frames.

    Input ``(b*t, s, c)`` is viewed as ``(b*s, t, c)`` so every spatial
    location attends over its 25-frame history (video_attention.py:116).
    Shipped Vista uses ``ff_in=True`` (extra_ff_mix_layer) and
    ``use_spatial_context=True`` (cross-attn over the CLIP/action context).
    """

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    ff_in: bool = True
    add_lora: bool = False
    action_control: bool = False
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    # bound the live rows of the (b*h*w, t, c) workload: when b*s exceeds
    # this, the block body runs as an nn.scan over row chunks with broadcast
    # params (exact — every op is per-row). Bounds the multi-GB q/k/v/logit
    # transients at 576x1024 (b*s = 230k rows) that the reference handled
    # with xformers' 32768-row chunking (attention.py:384-399).
    max_rows: int = 65536

    @nn.compact
    def __call__(self, x: Array, num_frames: int, time_context: Optional[Array] = None) -> Array:
        bt, s, c = x.shape
        b = bt // num_frames
        # (b t) s c -> (b s) t c
        x = x.reshape(b, num_frames, s, c).transpose(0, 2, 1, 3).reshape(b * s, num_frames, c)

        # sublane-align the frame axis for the fused attn1 kernel: t=25 pads
        # to 32 physically anyway, so the explicit pad costs no real compute
        # and makes every in-kernel reshape a legal aligned shape cast. Only
        # when attn1 will actually take the fused path (its softmax masks the
        # pad keys; the composed fallback would attend to garbage).
        from vista_tpu.ops.attention import resolve_backend
        from vista_tpu.ops.fused_temporal_attn import fused_temporal_attn_supported

        inner = self.heads * self.dim_head
        t_pad = 0
        if resolve_backend(self.backend) == "pallas" and not self.add_lora:
            t_aligned = num_frames + ((-num_frames) % 8)
            if (fused_temporal_attn_supported(t_aligned, self.dim, inner)
                    and t_aligned != num_frames):
                t_pad = t_aligned - num_frames
                x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))
        t_run = num_frames + t_pad

        rows = b * s
        n_chunks = 1
        if time_context is not None:
            while rows // n_chunks > self.max_rows and rows % (n_chunks * 2) == 0:
                n_chunks *= 2
            if n_chunks > 1 and time_context.shape[0] != rows:
                # the scan path slices context per row chunk; materialize the
                # per-row repeat only in this (rare, huge-rows) case — the
                # unchunked path hands the per-video context straight to the
                # cross-attention, which broadcasts its OUTPUT instead
                time_context = jnp.repeat(time_context, rows // time_context.shape[0],
                                          axis=0)

        core_kwargs = dict(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            context_dim=self.context_dim, ff_in=self.ff_in, add_lora=self.add_lora,
            action_control=self.action_control, backend=self.backend, dtype=self.dtype,
            valid_t=num_frames,
        )
        if n_chunks > 1:
            chunk = rows // n_chunks
            xs = x.reshape(n_chunks, chunk, t_run, c)
            tcs = time_context.reshape(n_chunks, chunk, *time_context.shape[1:])
            ScanCore = nn.scan(
                _TemporalCore,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=0,
            )
            _, x = ScanCore(**core_kwargs, name="core")(0, (xs, tcs))
            x = x.reshape(rows, t_run, c)
        else:
            _, x = _TemporalCore(**core_kwargs, name="core")(0, (x, time_context))

        if t_pad:
            x = x[:, :num_frames]
        # (b s) t c -> (b t) s c
        x = x.reshape(b, s, num_frames, c).transpose(0, 2, 1, 3).reshape(bt, s, c)
        return x


class SpatialVideoTransformer(nn.Module):
    """Spatial + temporal transformer pair with alpha-blend merge (NHWC in/out).

    Per depth level: spatial TransformerBlock over the ``h*w`` tokens, then a
    frame-position embedding is added and the TemporalTransformerBlock runs
    over the ``t`` axis; the results merge through a learned AlphaBlender.
    ``use_spatial_context``: the temporal cross-attention context is the
    *first frame's* spatial context repeated per location
    (video_attention.py:884-889).
    """

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    merge_factor: float = 0.5
    merge_strategy: str = "learned_with_images"
    use_spatial_context: bool = True
    ff_in: bool = True
    max_time_embed_period: int = 10000
    add_lora: bool = False
    action_control: bool = False
    backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array], num_frames: int) -> Array:
        bt, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x

        time_context = None
        if self.use_spatial_context and context is not None:
            # first frame's context per video, (b*t, 1, d) -> (b, 1, d). The
            # reference repeats this h*w-fold per spatial location
            # (video_attention.py:252-257) — here the single-token
            # cross-attention broadcasts its output instead, so the repeated
            # context (hundreds of MB at full res) is never materialized.
            b = bt // num_frames
            time_context = context.reshape(b, num_frames, *context.shape[1:])[:, 0]

        x = GroupNorm32(num_groups=32, eps=1e-6, name="norm")(x)
        x = x.reshape(bt, h * w, c)
        x = dense(inner, dtype=self.dtype, name="proj_in")(x)

        # learned MLP over a sinusoidal frame-index embedding, added before the
        # temporal block (video_attention.py:902-917)
        frame_idx = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32), bt // num_frames)
        t_emb = timestep_embedding(frame_idx, self.channels,
                                   max_period=self.max_time_embed_period, dtype=self.dtype)
        pos = dense(self.channels * 4, dtype=self.dtype, name="time_pos_embed_fc1")(t_emb)
        pos = dense(inner, dtype=self.dtype, name="time_pos_embed_fc2")(nn.silu(pos))
        pos = pos[:, None]

        blender = AlphaBlender(self.merge_factor, self.merge_strategy, name="time_mixer")
        for d in range(self.depth):
            x = TransformerBlock(
                inner, self.heads, self.dim_head, context_dim=self.context_dim,
                add_lora=self.add_lora, action_control=self.action_control,
                backend=self.backend, dtype=self.dtype, name=f"block_{d}",
            )(x, context=context)
            x_mix = TemporalTransformerBlock(
                inner, self.heads, self.dim_head, context_dim=self.context_dim,
                ff_in=self.ff_in, add_lora=self.add_lora, action_control=self.action_control,
                backend=self.backend, dtype=self.dtype, name=f"time_block_{d}",
            )(x + pos, num_frames=num_frames, time_context=time_context)
            x = blender(x, x_mix)

        x = dense(self.channels, dtype=self.dtype, name="proj_out", kernel_init=zero_init)(x)
        x = x.reshape(bt, h, w, self.channels)
        return x + x_in
