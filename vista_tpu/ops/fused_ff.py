"""Fused pre-LN GEGLU feed-forward Pallas kernel (x + FF(LN(x))).

Every transformer block ends with ``x = x + proj_out(geglu(proj_in(LN(x))))``
(reference attention.py:48-72,424-524). On XLA the 2*4*c-wide ``proj_in``
output is a dot result and must materialize in HBM before the ``proj_out``
dot consumes it — at 576x1024 that's a 2.4 GB round trip per FF, plus the
LN pass and the residual pass (~6 ms per ds1-sized FF, ~45 FF sites per
denoise eval; tools/xprof.py).

This kernel keeps the whole chain in VMEM per token tile: LN (fp32 stats)
-> proj_in matmul -> split + GEGLU -> proj_out matmul -> residual
add. Both weight matrices stay VMEM-resident across grid steps. HBM
traffic: 1 read + 1 write of x. Covers all UNet widths (c <= 1280; at
c=1280 the 39MB of weights still fit VMEM and measured 7.5x over the
composed XLA path at 28800 tokens).

Inputs must flatten to (tokens, c) layout-free: callers with a
sublane-unaligned middle dim (the temporal stack's t=25) pad it to 32 first
(TemporalTransformerBlock) — the hardware tiles 25 -> 32 physically anyway,
so explicit padding adds no real compute and keeps every reshape aligned
(Mosaic rejects unaligned shape casts).

Backward: a second Pallas kernel for c <= 640 — recomputes the forward
chain per token tile in VMEM and produces dx plus all parameter grads via
sequential-grid accumulators, so neither the ``(rows, 2*inner)`` recompute
temps nor the dH cotangent ever touch HBM. At c=1280 the fp32 dW1/dW2
accumulators alone are ~79 MB (over the VMEM budget next to the resident
weights), so wide layers keep the chunked XLA-recompute VJP: a serial
``lax.map`` over token chunks, exact while bounding the fp32
``(rows, 2*inner)`` temps (unchunked recompute at 576x1024 materializes a
2.8 GB fp32 tensor, which OOMed the full-res single-chip train step).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vista_tpu.ops.tiling import bwd_chunks, tile_rows

Array = jnp.ndarray

_VMEM_LIMIT = 100 * 1024 * 1024
# c=1280 measured 7.5x faster fused than composed-XLA in isolation (69ms ->
# 9.3ms at 28800 tokens; weights 39MB stay VMEM-resident, h never hits HBM)
MAX_FUSED_FF_DIM = 1280
# In-kernel inner-dim strip count. With strips > 1 the GEGLU chain runs per
# strip, so the next strip's proj_in matmul is data-independent of the
# current strip's VPU gelu — Mosaic can overlap MXU and VPU work instead of
# serializing dot1 -> gelu -> dot2 over the full (tile, 2*inner) transient.
# Env override is the A/B sweep knob (accepted only on a bench.py A/B).
_FF_STRIPS = int(os.environ.get("VISTA_FF_STRIPS", "1"))


def ff_shape_supported(c: int) -> bool:
    return c <= MAX_FUSED_FF_DIM and c % 8 == 0


def ff_input_supported(shape) -> bool:
    """All leading-dim merges must be sublane-aligned (free reshapes)."""
    return (ff_shape_supported(shape[-1])
            and all(d % 8 == 0 for d in shape[1:-1]))


def _gelu_tanh(g):
    """tanh-form GELU (fp32). Mosaic has no erf primitive; the tanh form's
    max absolute error vs exact GELU (~3e-4) is far below the bf16 output
    quantization (~8e-3 relative) of the compute dtype, so it is
    indistinguishable from ``nn.gelu(approximate=False)`` at bf16."""
    return 0.5 * g * (1.0 + jnp.tanh(0.7978845608028654 * (g + 0.044715 * g * g * g)))


def _ff_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
               eps: float, inner: int, strips: int):
    """strips == 1: w1/b1 are in the natural [a-half | g-half] column order.
    strips > 1: columns pre-packed strip-major ([a_0 g_0 a_1 g_1 ...], see
    _pack_strips) so each strip's proj_in is one contiguous dot."""
    x2 = x_ref[...]  # (tile, C)
    c = x2.shape[-1]

    xf = x2.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[...]
          + lnb_ref[...]).astype(x2.dtype)

    s = inner // strips
    acc = xf + b2_ref[...]
    for j in range(strips):
        h = jax.lax.dot_general(
            xn, w1_ref[:, 2 * s * j:2 * s * (j + 1)], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[:, 2 * s * j:2 * s * (j + 1)]
        a, g = h[:, :s], h[:, s:]
        hg = (a * _gelu_tanh(g)).astype(x2.dtype)
        acc = acc + jax.lax.dot_general(
            hg, w2_ref[s * j:s * (j + 1), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _n_strips(inner: int) -> int:
    """Strip count for this width: every strip boundary must be lane-aligned
    (128) on both the w1 column axis and the w2 row axis."""
    s = _FF_STRIPS
    while s > 1 and (inner % s != 0 or (inner // s) % 128 != 0):
        s //= 2
    return max(s, 1)


def _pack_strips(w1: Array, b1: Array, inner: int, strips: int):
    """Reorder proj_in columns from [a | g] halves to strip-major
    [a_0 g_0 a_1 g_1 ...] so the kernel slices one contiguous block per
    strip. Pure column permutation — cheap relative to the FF itself."""
    c = w1.shape[0]
    s = inner // strips
    w1p = w1.reshape(c, 2, strips, s).transpose(0, 2, 1, 3).reshape(c, 2 * inner)
    b1p = b1.reshape(2, strips, s).transpose(1, 0, 2).reshape(2 * inner)
    return w1p, b1p


def _xla_reference(x, ln_s, ln_b, w1, b1, w2, b2, eps=1e-5):
    c = x.shape[-1]
    inner = w2.shape[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * ln_s + ln_b).astype(x.dtype)
    # same tanh-form GELU as the kernel (the VJP differentiates this exact fn)
    h = (xn @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    a, g = h[..., :inner], h[..., inner:]
    hg = (a * _gelu_tanh(g)).astype(x.dtype)
    y = (hg @ w2.astype(x.dtype)).astype(jnp.float32) + b2
    return (xf + y).astype(x.dtype)


_tile_rows = tile_rows


def _ff_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps):
    orig_shape = x.shape
    c = x.shape[-1]
    inner = w2.shape[0]

    # the flatten must be layout-free: callers guarantee sublane-aligned
    # middle dims (ff_input_supported); unaligned merges are Mosaic-illegal
    # shape casts AND real HBM relayouts
    n = x.size // c
    x_in = x.reshape(n, c)

    # ~16MB budget for the widest live transient, (tokens, 2*inner/strips)
    # fp32 (isolated sweep: 5x faster than 8MB; flat at 32MB)
    strips = _n_strips(inner)
    target = max((1 << 24) // max(2 * (inner // strips) * 4, 1), 1)
    tile = _tile_rows(n, target)
    n_p = n

    blk = (tile, c)
    idx = lambda i: (i, 0)
    wide = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    w1c = w1.astype(x.dtype)
    b1c = b1.astype(jnp.float32)
    if strips > 1:
        w1c, b1c = _pack_strips(w1c, b1c, inner, strips)
    w2c = w2.astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_ff_kernel, eps=eps, inner=inner, strips=strips),
        grid=(n_p // tile,),
        in_specs=[
            pl.BlockSpec(blk, idx),
            wide((1, c)), wide((1, c)),
            wide((c, 2 * inner)), wide((1, 2 * inner)),
            wide((inner, c)), wide((1, c)),
        ],
        out_specs=pl.BlockSpec(blk, idx),
        out_shape=jax.ShapeDtypeStruct(x_in.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * c * 4 * inner + 10 * n_p * c,
            bytes_accessed=2 * n_p * c * x.dtype.itemsize,
            transcendentals=n_p * inner,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_in,
      ln_s.astype(jnp.float32).reshape(1, c), ln_b.astype(jnp.float32).reshape(1, c),
      w1c, b1c.reshape(1, 2 * inner),
      w2c, b2.astype(jnp.float32).reshape(1, c))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_geglu_ff(x: Array, ln_s: Array, ln_b: Array, w1: Array, b1: Array,
                   w2: Array, b2: Array, eps: float = 1e-5) -> Array:
    """``x + proj_out(geglu(proj_in(LN(x))))`` in one VMEM-resident pass."""
    return _ff_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps)


def _vjp_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps):
    return _ff_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps), (x, ln_s, ln_b, w1, b1, w2, b2)


# cap the per-chunk fp32 (rows, 2*inner) backward recompute temp near this
_BWD_TEMP_BYTES = 256 << 20
# widest layer whose fp32 dW1/dW2 grid accumulators + resident weights fit
# the VMEM budget (c=640: ~30 MB; c=1280 would need ~118 MB)
MAX_FUSED_BWD_DIM = 640


def _bwd_chunks(n: int, inner2: int) -> int:
    return bwd_chunks(n, inner2, _BWD_TEMP_BYTES)


def _gelu_tanh_grad(g):
    """d/dg of the tanh-form GELU (fp32)."""
    u = 0.7978845608028654 * (g + 0.044715 * g * g * g)
    t = jnp.tanh(u)
    du = 0.7978845608028654 * (1.0 + 3.0 * 0.044715 * g * g)
    return 0.5 * (1.0 + t) + 0.5 * g * (1.0 - t * t) * du


def _ff_bwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, g_ref,
                   dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                   db2_ref, *, eps: float, inner: int):
    """Recompute the forward chain for this token tile and emit dx plus
    parameter-grad partial sums. The grad accumulators map every grid step
    to the same block (index map -> 0), so they stay VMEM-resident across
    the sequential grid and are written back once."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x2 = x_ref[...]
    c = x2.shape[-1]
    cdt = x2.dtype

    # ---- forward recompute (identical math to _ff_kernel) ----
    xf = x2.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - mean * mean
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * r
    lns = lns_ref[...]
    xn = (xhat * lns + lnb_ref[...]).astype(cdt)
    h = jax.lax.dot_general(
        xn, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...]
    a, g = h[:, :inner], h[:, inner:]
    ga = _gelu_tanh(g)
    hg = (a * ga).astype(cdt)

    # ---- backward ----
    gy = g_ref[...].astype(jnp.float32)           # (tile, C)
    gyc = gy.astype(cdt)
    db2_ref[...] += jnp.sum(gy, axis=0, keepdims=True)
    # dW2 += hg^T gy  (contract over the token tile)
    dw2_ref[...] += jax.lax.dot_general(
        hg, gyc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dhg = jax.lax.dot_general(                     # gy @ W2^T -> (tile, inner)
        gyc, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = dhg * ga
    dg = dhg * a * _gelu_tanh_grad(g)
    dh = jnp.concatenate([da, dg], axis=-1)        # (tile, 2*inner) fp32
    dhc = dh.astype(cdt)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(           # xn^T dH -> (C, 2*inner)
        xn, dhc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dxn = jax.lax.dot_general(                     # dH @ W1^T -> (tile, C)
        dhc, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dlns_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    # LayerNorm backward: dxf = r*(dxhat - mean(dxhat) - xhat*mean(dxhat*xhat))
    dxhat = dxn * lns
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / c
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) / c
    dxf = r * (dxhat - m1 - xhat * m2)
    dx_ref[...] = (gy + dxf).astype(dx_ref.dtype)


def _ff_bwd_pallas(x, ln_s, ln_b, w1, b1, w2, g, eps):
    """Fused backward for c <= MAX_FUSED_BWD_DIM: one sequential-grid pass,
    no HBM transients. Returns grads in the primal dtypes."""
    orig_shape = x.shape
    c = x.shape[-1]
    inner = w2.shape[0]
    n = x.size // c
    x_in = x.reshape(n, c)
    g_in = g.reshape(n, c)

    # live fp32 transients are ~4 tile-rows wide at 2*inner: h, dH (+ their
    # compute-dtype casts); budget them to ~24MB together
    target = max((3 << 22) // max(2 * inner * 4, 1), 1)
    tile = _tile_rows(n, target)

    blk = (tile, c)
    idx = lambda i: (i, 0)
    wide = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    f32 = jnp.float32
    dx, dlns, dlnb, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, eps=eps, inner=inner),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec(blk, idx),
            wide((1, c)), wide((1, c)),
            wide((c, 2 * inner)), wide((1, 2 * inner)),
            wide((inner, c)),
            pl.BlockSpec(blk, idx),
        ],
        out_specs=[
            pl.BlockSpec(blk, idx),
            wide((1, c)), wide((1, c)),
            wide((c, 2 * inner)), wide((1, 2 * inner)),
            wide((inner, c)), wide((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), f32), jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, 2 * inner), f32),
            jax.ShapeDtypeStruct((1, 2 * inner), f32),
            jax.ShapeDtypeStruct((inner, c), f32), jax.ShapeDtypeStruct((1, c), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # accumulators: sequential
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * c * 4 * inner + 20 * n * c,
            bytes_accessed=4 * n * c * x.dtype.itemsize,
            transcendentals=2 * n * inner,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_in,
      ln_s.astype(f32).reshape(1, c), ln_b.astype(f32).reshape(1, c),
      w1.astype(x.dtype), b1.astype(f32).reshape(1, 2 * inner),
      w2.astype(x.dtype), g_in)
    return (dx.reshape(orig_shape),
            dlns.reshape(ln_s.shape).astype(ln_s.dtype),
            dlnb.reshape(ln_b.shape).astype(ln_b.dtype),
            dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape((c,)))


def _vjp_bwd(eps, residuals, g):
    x, ln_s, ln_b, w1, b1, w2, b2 = residuals
    c = x.shape[-1]
    n = x.size // c
    if c <= MAX_FUSED_BWD_DIM:
        dx, dlns, dlnb, dw1, db1, dw2, db2 = _ff_bwd_pallas(
            x, ln_s, ln_b, w1, b1, w2, g, eps)
        return dx, dlns, dlnb, dw1, db1, dw2, db2.astype(b2.dtype)
    f = lambda *a: _xla_reference(*a, eps=eps)
    chunks = _bwd_chunks(n, w1.shape[-1])
    if chunks == 1:
        _, vjp = jax.vjp(f, x, ln_s, ln_b, w1, b1, w2, b2)
        return vjp(g)

    def one(args):
        xc, gc = args
        _, vjp = jax.vjp(f, xc, ln_s, ln_b, w1, b1, w2, b2)
        return vjp(gc)

    dx, *dps = jax.lax.map(
        one, (x.reshape(chunks, n // chunks, c), g.reshape(chunks, n // chunks, c)))
    # param grads sum over tokens; chunk partials accumulate in their own
    # (fp32) dtype, only the reduction order differs from the unchunked vjp
    return (dx.reshape(x.shape), *(dp.sum(axis=0) for dp in dps))


fused_geglu_ff.defvjp(_vjp_fwd, _vjp_bwd)
