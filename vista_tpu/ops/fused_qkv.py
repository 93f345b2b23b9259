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

Backward: XLA-recompute VJP (exact math, standard remat cost), chunked over
the token axis like fused_ff — LN + per-token dots are row-independent, so
a serial ``lax.map`` bounds the fp32 recompute temps at full-res trainings.
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
def fused_ln_qkv(x: Array, ln_s: Array, ln_b: Array,
                 wq: Array, wk: Array, wv: Array, eps: float = 1e-5):
    """``(q, k, v) = to_qkv(LN(x))`` in one VMEM-resident pass."""
    return _fwd(x, ln_s, ln_b, wq, wk, wv, eps)


def _vjp_fwd(x, ln_s, ln_b, wq, wk, wv, eps):
    return _fwd(x, ln_s, ln_b, wq, wk, wv, eps), (x, ln_s, ln_b, wq, wk, wv)


# cap the per-chunk fp32 backward recompute temps near this
_BWD_TEMP_BYTES = 256 << 20


def _bwd_chunks(n: int, width: int) -> int:
    return bwd_chunks(n, width, _BWD_TEMP_BYTES)


def _vjp_bwd(eps, residuals, g):
    x, ln_s, ln_b, wq, wk, wv = residuals
    f = lambda *a: _xla_reference(*a, eps=eps)
    c = x.shape[-1]
    inner = wq.shape[1]
    n = x.size // c
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


fused_ln_qkv.defvjp(_vjp_fwd, _vjp_bwd)
