"""Fused Pallas attention for tiny sequences (the temporal t=25 workload).

The temporal attention of the VideoUNet attends over only ``t = 25`` frames
but with a huge batch (b*h*w rows — 18k at 576x1024; reference
video_attention.py:116). XLA's batched-matmul lowering runs this at ~2 TF/s:
the (25, 25) logits round-trip through HBM between the two dots, the head
split/merge relayouts copy the full tensor, and each tiny matmul underfills
the MXU anyway.

This kernel fuses logits -> fp32 softmax -> PV per row-tile entirely in
VMEM on the packed ``(rows, T, heads*d)`` layout (no relayouts), with the
row batch carried as a dot_general batch dimension. The backward is a
second Pallas kernel with the same structure (recompute p per row group,
then dq/dk/dv via the softmax VJP) — everything is row-local, so there are
no cross-tile accumulators and the grid stays parallel. The XLA-recompute
VJP remains as a monkeypatch-able fallback (``_PALLAS_BWD = False``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# covers the temporal t=25 workload AND the mid-resolution spatial
# attentions that fall between this kernel and the flash crossover (2048):
# ds4 s=576 / mid s=144 at 576x1024, ds2 s=720 at 320x576 — XLA ran those
# at ~58ms/eval (13-18x slower than this kernel at s=576).
MAX_TINY_SEQ = 1024
# headroom for the unrolled per-head fp32 logit transients (see
# flash_attention._VMEM_LIMIT)
_VMEM_LIMIT = 100 * 1024 * 1024
# the unrolled head loop is straight-line code to Mosaic, so in the worst
# case every head's (t, t) fp32 logit tile (lane-padded to 128) is live at
# once on the VMEM stack; cap their sum well under _VMEM_LIMIT to leave room
# for the q/k/v/o pipeline buffers
_LOGIT_STACK_BUDGET = 64 * 1024 * 1024


def _pad128(n: int) -> int:
    return (n + 127) // 128 * 128


def tiny_shape_supported(s_q: int, s_k: int, num_heads: int = 1) -> bool:
    if s_q != s_k or s_q > MAX_TINY_SEQ:
        return False
    logit_bytes = num_heads * s_q * _pad128(s_q) * 4
    return logit_bytes <= _LOGIT_STACK_BUDGET


def _pick_group(rows: int, t: int, hd: int) -> int:
    """Rows per block: q/k/v/o blocks (x2 pipeline buffers) within ~8MB VMEM,
    and the group must divide the row count."""
    budget = max((8 << 20) // (t * hd * 2 * 8), 1)
    g = 512
    while g > budget:
        g //= 2
    while g > 1 and rows % g:
        g //= 2
    return g


def _tiny_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int, d: int):
    q = q_ref[...]  # (g, T, heads*d)
    k = k_ref[...]
    v = v_ref[...]
    # static head loop over 64-lane strips of the packed minor dim (Mosaic
    # blocks must span lane dims that are whole or 128-divisible)
    for h in range(heads):
        hs = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[..., hs], k[..., hs], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (g, T, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[..., hs] = jax.lax.dot_general(
            p.astype(v.dtype), v[..., hs], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _tiny_fwd(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    rows, t, hd = q.shape
    d = hd // num_heads
    g = _pick_group(rows, t, hd)
    grid = (rows // g,)

    return pl.pallas_call(
        functools.partial(_tiny_kernel, scale=d ** -0.5, heads=num_heads, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, t, hd), lambda r: (r, 0, 0)),
            pl.BlockSpec((g, t, hd), lambda r: (r, 0, 0)),
            pl.BlockSpec((g, t, hd), lambda r: (r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, t, hd), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, t, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * t * t * hd,
            bytes_accessed=4 * rows * t * hd * q.dtype.itemsize,
            transcendentals=rows * num_heads * t * t,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)


def _xla_packed_reference(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    rows, t, hd = q.shape
    d = hd // num_heads
    q4 = q.reshape(rows, t, num_heads, d)
    k4 = k.reshape(rows, t, num_heads, d)
    v4 = v.reshape(rows, t, num_heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q4, k4,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v4)
    return out.reshape(rows, t, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _tiny_attention_packed_local(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    return _tiny_fwd(q, k, v, num_heads)


def tiny_attention_packed(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    """Fused attention on ``(rows, T, heads*d)``; gate via tiny_shape_supported.

    Rows are independent, so under ``parallel.kernel_sharding`` the row dim
    runs as a zero-collective shard_map island (exact)."""
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    return shard_kernel(
        lambda q, k, v: _tiny_attention_packed_local(q, k, v, num_heads),
        (0, 0, 0), 0, q, k, v)


def _vjp_fwd(q, k, v, num_heads):
    return _tiny_fwd(q, k, v, num_heads), (q, k, v)


_PALLAS_BWD = True  # False -> XLA-recompute VJP (debug/fallback)


def _tiny_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                     scale: float, heads: int, d: int):
    q = q_ref[...]  # (g, T, heads*d)
    k = k_ref[...]
    v = v_ref[...]
    go = g_ref[...]
    cdt = q.dtype
    for h in range(heads):
        hs = slice(h * d, (h + 1) * d)
        q_h, k_h, v_h = q[..., hs], k[..., hs], v[..., hs]
        s = jax.lax.dot_general(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (g, T, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pc = p.astype(cdt)

        do_h = go[..., hs].astype(cdt)                   # (g, T, d)
        dv_ref[..., hs] = jax.lax.dot_general(           # p^T @ do
            pc, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(                        # do @ v^T
            do_h, v_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dsc = ds.astype(cdt)
        dq_ref[..., hs] = jax.lax.dot_general(           # ds @ k
            dsc, k_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[..., hs] = jax.lax.dot_general(           # ds^T @ q
            dsc, q_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _tiny_bwd_pallas(q, k, v, g, num_heads):
    rows, t, hd = q.shape
    d = hd // num_heads
    # more live per-row tensors than the forward (q/k/v/g in, 3 grads out,
    # fp32 p/dp/ds): halve the forward's group budget
    grp = max(_pick_group(rows, t, hd) // 2, 1)
    while grp > 1 and rows % grp:
        grp //= 2

    blk = pl.BlockSpec((grp, t, hd), lambda r: (r, 0, 0))
    sd = jax.ShapeDtypeStruct((rows, t, hd), q.dtype)
    return pl.pallas_call(
        functools.partial(_tiny_bwd_kernel, scale=d ** -0.5, heads=num_heads,
                          d=d),
        grid=(rows // grp,),
        in_specs=[blk, blk, blk, blk],
        out_specs=[blk, blk, blk],
        out_shape=[sd, sd, sd],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * rows * t * t * hd,
            bytes_accessed=7 * rows * t * hd * q.dtype.itemsize,
            transcendentals=rows * num_heads * t * t,
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, g)


def _vjp_bwd(num_heads, residuals, g):
    q, k, v = residuals
    if _PALLAS_BWD:
        return _tiny_bwd_pallas(q, k, v, g, num_heads)
    # T^2 logits are tiny: the XLA-recompute VJP is exact and memory-safe
    _, vjp = jax.vjp(lambda q, k, v: _xla_packed_reference(q, k, v, num_heads),
                     q, k, v)
    return vjp(g)


_tiny_attention_packed_local.defvjp(_vjp_fwd, _vjp_bwd)
