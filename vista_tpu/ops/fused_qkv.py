"""Fused pre-LN q/k/v projection Pallas kernel for self-attention.

The spatial transformer blocks' self-attention starts with
``q,k,v = to_{q,k,v}(LN(x))`` (reference attention.py:176-219). Composed,
that is one LN pass plus three narrow (K=N=c) dots that each re-read the
normalized tensor from HBM — at c=320 the dots are MXU-underutilized
(~119 TF/s measured) and the whole chain moves 8 HBM passes of x.

This kernel reads x once per token tile, computes the fp32-stat LN in
VMEM, runs the three projections against VMEM-resident weights, and writes
q, k, v — 1 read + 3 writes, no LN materialization, no weight re-reads.
The flash kernel then consumes q/k/v in this exact packed row-major layout.

Backward: a second Pallas kernel (all supported widths — the three fp32
dW accumulators are only ~20 MB even at c=1280): recomputes the LN per
token tile in VMEM and emits dx plus all parameter grads via
sequential-grid accumulators, so no fp32 recompute temps touch HBM. A
chunked XLA-recompute VJP is kept as a monkeypatch-able fallback
(``MAX_FUSED_BWD_DIM = 0``) mirroring fused_ff's wide-layer path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vista_tpu.ops.tiling import bwd_chunks, tile_rows

Array = jnp.ndarray

_VMEM_LIMIT = 100 * 1024 * 1024
MAX_FUSED_QKV_DIM = 1280


def qkv_input_supported(shape, inner: int) -> bool:
    """Token-flatten must be sublane-aligned (free reshape)."""
    c = shape[-1]
    return (c <= MAX_FUSED_QKV_DIM and c % 8 == 0 and inner % 8 == 0
            and all(d % 8 == 0 for d in shape[1:-1]))


def _qkv_kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                q_ref, k_ref, v_ref, *, eps: float):
    x2 = x_ref[...]  # (tile, C)
    c = x2.shape[-1]

    xf = x2.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[...]
          + lnb_ref[...]).astype(x2.dtype)

    def proj(w_ref):
        return jax.lax.dot_general(
            xn, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x2.dtype)

    q_ref[...] = proj(wq_ref)
    k_ref[...] = proj(wk_ref)
    v_ref[...] = proj(wv_ref)


def _xla_reference(x, ln_s, ln_b, wq, wk, wv, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * ln_s + ln_b).astype(x.dtype)
    w = lambda a: a.astype(x.dtype)
    return xn @ w(wq), xn @ w(wk), xn @ w(wv)


_tile_rows = tile_rows


def _fwd(x, ln_s, ln_b, wq, wk, wv, eps):
    orig_shape = x.shape
    c = x.shape[-1]
    inner = wq.shape[1]
    n = x.size // c
    x_in = x.reshape(n, c)

    # ~8MB budget for the fp32 projection transients (3x (tile, inner))
    target = max((1 << 23) // max(3 * inner * 4, 1), 8)
    tile = _tile_rows(n, target)

    blk_in = pl.BlockSpec((tile, c), lambda i: (i, 0))
    blk_out = pl.BlockSpec((tile, inner), lambda i: (i, 0))
    wide = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out_sd = jax.ShapeDtypeStruct((n, inner), x.dtype)

    q, k, v = pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps),
        grid=(n // tile,),
        in_specs=[
            blk_in,
            wide((1, c)), wide((1, c)),
            wide((c, inner)), wide((c, inner)), wide((c, inner)),
        ],
        out_specs=[blk_out, blk_out, blk_out],
        out_shape=[out_sd, out_sd, out_sd],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * c * inner + 10 * n * c,
            bytes_accessed=(n * c + 3 * n * inner) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_in,
      ln_s.astype(jnp.float32).reshape(1, c), ln_b.astype(jnp.float32).reshape(1, c),
      wq.astype(x.dtype), wk.astype(x.dtype), wv.astype(x.dtype))

    out_shape = orig_shape[:-1] + (inner,)
    return q.reshape(out_shape), k.reshape(out_shape), v.reshape(out_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_ln_qkv_local(x: Array, ln_s: Array, ln_b: Array,
                        wq: Array, wk: Array, wv: Array, eps: float = 1e-5):
    return _fwd(x, ln_s, ln_b, wq, wk, wv, eps)


def fused_ln_qkv(x: Array, ln_s: Array, ln_b: Array,
                 wq: Array, wk: Array, wv: Array, eps: float = 1e-5):
    """``(q, k, v) = to_qkv(LN(x))`` in one VMEM-resident pass.

    Token rows are independent; under ``parallel.kernel_sharding`` the batch
    dim runs as a shard_map island (weights replicated per shard — the same
    just-in-time gather GSPMD gives a plain matmul)."""
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    return shard_kernel(
        lambda *a: _fused_ln_qkv_local(*a, eps),
        (0, None, None, None, None, None), (0, 0, 0),
        x, ln_s, ln_b, wq, wk, wv)


def _vjp_fwd(x, ln_s, ln_b, wq, wk, wv, eps):
    return _fwd(x, ln_s, ln_b, wq, wk, wv, eps), (x, ln_s, ln_b, wq, wk, wv)


# cap the per-chunk fp32 backward recompute temps near this
_BWD_TEMP_BYTES = 256 << 20
# Pallas bwd covers every width the fwd accepts; set to 0 to force the
# chunked XLA fallback (tests do, mirroring fused_ff's wide-layer path)
MAX_FUSED_BWD_DIM = MAX_FUSED_QKV_DIM


def _bwd_chunks(n: int, width: int) -> int:
    return bwd_chunks(n, width, _BWD_TEMP_BYTES)


def _qkv_bwd_kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                    gq_ref, gk_ref, gv_ref,
                    dx_ref, dlns_ref, dlnb_ref, dwq_ref, dwk_ref, dwv_ref,
                    *, eps: float):
    """LN recompute + grads for this token tile; dW/dln accumulators map all
    grid steps to block 0 and stay VMEM-resident across the sequential grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)

    x2 = x_ref[...]
    c = x2.shape[-1]
    cdt = x2.dtype

    xf = x2.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - mean * mean
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * r
    lns = lns_ref[...]
    xn = (xhat * lns + lnb_ref[...]).astype(cdt)

    dxn = jnp.zeros_like(xf)
    for g_ref, w_ref, dw_ref in ((gq_ref, wq_ref, dwq_ref),
                                 (gk_ref, wk_ref, dwk_ref),
                                 (gv_ref, wv_ref, dwv_ref)):
        gi = g_ref[...].astype(cdt)
        dw_ref[...] += jax.lax.dot_general(   # xn^T g_i -> (C, inner)
            xn, gi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dxn = dxn + jax.lax.dot_general(      # g_i @ W_i^T -> (tile, C)
            gi, w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dlns_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    dxhat = dxn * lns
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / c
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) / c
    dx_ref[...] = (r * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _qkv_bwd_pallas(x, ln_s, ln_b, wq, wk, wv, g, eps):
    orig_shape = x.shape
    c = x.shape[-1]
    inner = wq.shape[1]
    n = x.size // c
    x_in = x.reshape(n, c)
    gq, gk, gv = (gi.reshape(n, inner) for gi in g)

    # fp32 transients per tile row: xf/xhat/dxn/dxhat (~4c) + 3 g casts
    target = max((1 << 24) // max((4 * c + 3 * inner) * 4, 1), 8)
    tile = _tile_rows(n, target)

    blk_in = pl.BlockSpec((tile, c), lambda i: (i, 0))
    blk_g = pl.BlockSpec((tile, inner), lambda i: (i, 0))
    wide = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    f32 = jnp.float32
    w_sd = jax.ShapeDtypeStruct((c, inner), f32)

    dx, dlns, dlnb, dwq, dwk, dwv = pl.pallas_call(
        functools.partial(_qkv_bwd_kernel, eps=eps),
        grid=(n // tile,),
        in_specs=[
            blk_in,
            wide((1, c)), wide((1, c)),
            wide((c, inner)), wide((c, inner)), wide((c, inner)),
            blk_g, blk_g, blk_g,
        ],
        out_specs=[
            blk_in,
            wide((1, c)), wide((1, c)),
            wide((c, inner)), wide((c, inner)), wide((c, inner)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), f32), jax.ShapeDtypeStruct((1, c), f32),
            w_sd, w_sd, w_sd,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # accumulators: sequential
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * c * inner + 20 * n * c,
            bytes_accessed=(2 * n * c + 3 * n * inner) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_in,
      ln_s.astype(f32).reshape(1, c), ln_b.astype(f32).reshape(1, c),
      wq.astype(x.dtype), wk.astype(x.dtype), wv.astype(x.dtype),
      gq, gk, gv)
    return (dx.reshape(orig_shape),
            dlns.reshape(ln_s.shape).astype(ln_s.dtype),
            dlnb.reshape(ln_b.shape).astype(ln_b.dtype),
            dwq.astype(wq.dtype), dwk.astype(wk.dtype), dwv.astype(wv.dtype))


def _vjp_bwd(eps, residuals, g):
    x, ln_s, ln_b, wq, wk, wv = residuals
    f = lambda *a: _xla_reference(*a, eps=eps)
    c = x.shape[-1]
    inner = wq.shape[1]
    n = x.size // c
    if c <= MAX_FUSED_BWD_DIM:
        return _qkv_bwd_pallas(x, ln_s, ln_b, wq, wk, wv, g, eps)
    # widest per-row temps: the fp32 xn recompute (c) / three dot grads (3*inner)
    chunks = _bwd_chunks(n, max(c, 3 * inner))
    if chunks == 1:
        _, vjp = jax.vjp(f, x, ln_s, ln_b, wq, wk, wv)
        return vjp(g)

    gq, gk, gv = g
    m = n // chunks

    def one(args):
        xc, gqc, gkc, gvc = args
        _, vjp = jax.vjp(f, xc, ln_s, ln_b, wq, wk, wv)
        return vjp((gqc, gkc, gvc))

    dx, *dps = jax.lax.map(one, (
        x.reshape(chunks, m, c), gq.reshape(chunks, m, inner),
        gk.reshape(chunks, m, inner), gv.reshape(chunks, m, inner)))
    # param grads sum over tokens; only the reduction order differs
    return (dx.reshape(x.shape), *(dp.sum(axis=0) for dp in dps))


_fused_ln_qkv_local.defvjp(_vjp_fwd, _vjp_bwd)
