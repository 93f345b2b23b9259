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

Backward, two Pallas kernels by width:
- c <= 640: recompute the forward chain per token tile in VMEM and produce
  dx plus ALL parameter grads via sequential-grid fp32 accumulators —
  neither the ``(rows, 2*inner)`` recompute temps nor the dH cotangent ever
  touch HBM.
- c > 640 (the ds4 c=1280 sites): the fp32 dW1/dW2 accumulators alone are
  ~79 MB (over the VMEM budget next to the resident weights), so the wide
  kernel instead EXPORTS the recomputed activations (xn, hg, dH) in the
  compute dtype and the two dW contractions run as plain XLA MXU matmuls;
  a row-chunked ``lax.scan`` bounds the exported temps at full resolution
  (the unchunked bf16 dH alone is ~590 MB at 576x1024; the old fp32
  XLA-recompute temps OOMed the single-chip full-res train step outright).
  The chunked XLA-recompute VJP stays as the monkeypatch fallback
  (``_WIDE_PALLAS_BWD = False``).
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
# c=1280 measured 7.5x faster fused than composed-XLA in isolation (69ms ->
# 9.3ms at 28800 tokens; weights 39MB stay VMEM-resident, h never hits HBM)
MAX_FUSED_FF_DIM = 1280
# NEGATIVE RESULT (round 3, don't retry): in-kernel inner-dim strip
# pipelining (running the dot1 -> GEGLU -> dot2 chain per inner-dim strip so
# Mosaic could overlap MXU and VPU work) measured WORSE on the headline
# bench.py A/B: 0.6116 f/s (strips=1) vs 0.6040 (strips=2) / 0.6069
# (strips=4). The strip machinery (column repacking + per-strip dots) was
# deleted; see git history of VISTA_FF_STRIPS for the implementation.


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
               eps: float, inner: int):
    x2 = x_ref[...]  # (tile, C)
    c = x2.shape[-1]

    xf = x2.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[...]
          + lnb_ref[...]).astype(x2.dtype)

    h = jax.lax.dot_general(
        xn, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...]
    a, g = h[:, :inner], h[:, inner:]
    hg = (a * _gelu_tanh(g)).astype(x2.dtype)
    acc = xf + b2_ref[...] + jax.lax.dot_general(
        hg, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


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

    # ~16MB budget for the widest live transient, (tokens, 2*inner) fp32
    # (isolated sweep: 5x faster than 8MB; flat at 32MB)
    target = max((1 << 24) // max(2 * inner * 4, 1), 1)
    tile = _tile_rows(n, target)
    n_p = n

    blk = (tile, c)
    idx = lambda i: (i, 0)
    wide = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    w1c = w1.astype(x.dtype)
    b1c = b1.astype(jnp.float32)
    w2c = w2.astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_ff_kernel, eps=eps, inner=inner),
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
def _fused_geglu_ff_local(x: Array, ln_s: Array, ln_b: Array, w1: Array, b1: Array,
                          w2: Array, b2: Array, eps: float = 1e-5) -> Array:
    return _ff_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps)


def fused_geglu_ff(x: Array, ln_s: Array, ln_b: Array, w1: Array, b1: Array,
                   w2: Array, b2: Array, eps: float = 1e-5) -> Array:
    """``x + proj_out(geglu(proj_in(LN(x))))`` in one VMEM-resident pass.

    Token rows are independent; under ``parallel.kernel_sharding`` the batch
    dim runs as a zero-collective shard_map island (weights replicated)."""
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    return shard_kernel(
        lambda *a: _fused_geglu_ff_local(*a, eps),
        (0, None, None, None, None, None, None), 0,
        x, ln_s, ln_b, w1, b1, w2, b2)


def _vjp_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps):
    return _ff_fwd(x, ln_s, ln_b, w1, b1, w2, b2, eps), (x, ln_s, ln_b, w1, b1, w2, b2)


# cap the per-chunk fp32 (rows, 2*inner) backward recompute temp near this
_BWD_TEMP_BYTES = 256 << 20
# widest layer whose fp32 dW1/dW2 grid accumulators + resident weights fit
# the VMEM budget (c=640: ~30 MB; c=1280 would need ~118 MB). Wider layers
# take the activation-export Pallas backward (_ff_bwd_wide) unless
# _WIDE_PALLAS_BWD is monkeypatched off (-> chunked XLA-recompute VJP).
MAX_FUSED_BWD_DIM = 640
_WIDE_PALLAS_BWD = True


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


def _ff_bwd_wide_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, g_ref,
                        dx_ref, xn_ref, hg_ref, dh_ref, dlns_ref, dlnb_ref,
                        db1_ref, db2_ref, *, eps: float, inner: int):
    """Wide-layer (c > MAX_FUSED_BWD_DIM) backward: the fp32 dW1/dW2
    accumulators of ``_ff_bwd_kernel`` would blow VMEM (~79 MB at c=1280),
    so this kernel instead EXPORTS the recomputed activations (xn, hg, dH)
    in the compute dtype and the caller runs the two dW contractions as
    plain XLA MXU matmuls. Everything token-local (dx, the LN backward, the
    bias/scale reductions) still happens in one VMEM pass with the fp32
    ``h``/``dH`` transients never touching HBM."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
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

    # ---- backward (token-local parts) ----
    gy = g_ref[...].astype(jnp.float32)
    gyc = gy.astype(cdt)
    db2_ref[...] += jnp.sum(gy, axis=0, keepdims=True)
    dhg = jax.lax.dot_general(
        gyc, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = dhg * ga
    dg = dhg * a * _gelu_tanh_grad(g)
    dh = jnp.concatenate([da, dg], axis=-1)
    dhc = dh.astype(cdt)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxn = jax.lax.dot_general(
        dhc, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dlns_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    dxhat = dxn * lns
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / c
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) / c
    dxf = r * (dxhat - m1 - xhat * m2)
    dx_ref[...] = (gy + dxf).astype(dx_ref.dtype)
    xn_ref[...] = xn
    hg_ref[...] = hg
    dh_ref[...] = dhc


# per-chunk bf16 dH export cap for the wide backward (the dominant temp);
# full-res ds4 (28800 rows, 2*inner=10240) chunks to keep exported
# activations ~3x this (dH + hg + xn), well under the OOM margin
_WIDE_CHUNK_BYTES = 64 << 20


def _ff_bwd_wide_chunk(x_in, g_in, ln_s, ln_b, w1c, b1f, w2c, eps, inner):
    """One Pallas pass over ``(rows, c)`` + the two XLA dW matmuls.
    Returns (dx, dlns, dlnb, dw1, db1, dw2, db2) partials, all fp32 params."""
    n, c = x_in.shape
    # fp32 h/dH transients are the VMEM limiters: ~6 tile-rows at 2*inner
    target = max((3 << 22) // max(2 * inner * 4, 1), 1)
    tile = _tile_rows(n, target)
    blk = (tile, c)
    idx = lambda i: (i, 0)
    wide = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    f32 = jnp.float32

    dx, xn, hg, dh, dlns, dlnb, db1, db2 = pl.pallas_call(
        functools.partial(_ff_bwd_wide_kernel, eps=eps, inner=inner),
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
            pl.BlockSpec(blk, idx),
            pl.BlockSpec((tile, inner), idx),
            pl.BlockSpec((tile, 2 * inner), idx),
            wide((1, c)), wide((1, c)),
            wide((1, 2 * inner)), wide((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x_in.dtype),
            jax.ShapeDtypeStruct((n, c), x_in.dtype),
            jax.ShapeDtypeStruct((n, inner), x_in.dtype),
            jax.ShapeDtypeStruct((n, 2 * inner), x_in.dtype),
            jax.ShapeDtypeStruct((1, c), f32), jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, 2 * inner), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # accumulators: sequential
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * c * 4 * inner + 20 * n * c,
            bytes_accessed=8 * n * c * x_in.dtype.itemsize
            + 3 * n * inner * x_in.dtype.itemsize,
            transcendentals=2 * n * inner,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_in,
      ln_s.astype(f32).reshape(1, c), ln_b.astype(f32).reshape(1, c),
      w1c, b1f.reshape(1, 2 * inner), w2c, g_in)

    # the two big contractions over tokens, on the MXU with fp32 accumulation
    # (same operand dtypes as _ff_bwd_kernel's in-VMEM dW dots)
    dw1 = jax.lax.dot_general(xn, dh, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dw2 = jax.lax.dot_general(hg, g_in.astype(x_in.dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    return dx, dlns, dlnb, dw1, db1, dw2, db2


def _ff_bwd_wide(x, ln_s, ln_b, w1, b1, w2, g, eps):
    """Fused backward for MAX_FUSED_BWD_DIM < c <= MAX_FUSED_FF_DIM.
    Row-chunked (lax.scan) so the exported bf16 activations stay bounded at
    full resolution (the unchunked dH alone is ~590 MB at 576x1024 ds4)."""
    orig_shape = x.shape
    c = x.shape[-1]
    inner = w2.shape[0]
    n = x.size // c
    x_in = x.reshape(n, c)
    g_in = g.reshape(n, c)
    w1c = w1.astype(x.dtype)
    b1f = b1.astype(jnp.float32)
    w2c = w2.astype(x.dtype)

    rows_cap = max(_WIDE_CHUNK_BYTES // (2 * inner * x.dtype.itemsize), 1)
    chunk = _tile_rows(n, rows_cap)
    nchunks = n // chunk

    if nchunks == 1:
        dx, dlns, dlnb, dw1, db1, dw2, db2 = _ff_bwd_wide_chunk(
            x_in, g_in, ln_s, ln_b, w1c, b1f, w2c, eps, inner)
    else:
        f32 = jnp.float32
        acc0 = (jnp.zeros((1, c), f32), jnp.zeros((1, c), f32),
                jnp.zeros((c, 2 * inner), f32), jnp.zeros((1, 2 * inner), f32),
                jnp.zeros((inner, c), f32), jnp.zeros((1, c), f32))

        def body(acc, xs):
            xc, gc = xs
            dxc, dlns_c, dlnb_c, dw1_c, db1_c, dw2_c, db2_c = _ff_bwd_wide_chunk(
                xc, gc, ln_s, ln_b, w1c, b1f, w2c, eps, inner)
            new = tuple(a + p for a, p in zip(
                acc, (dlns_c, dlnb_c, dw1_c, db1_c, dw2_c, db2_c)))
            return new, dxc

        (dlns, dlnb, dw1, db1, dw2, db2), dx = jax.lax.scan(
            body, acc0,
            (x_in.reshape(nchunks, chunk, c), g_in.reshape(nchunks, chunk, c)))
        dx = dx.reshape(n, c)

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
    if _WIDE_PALLAS_BWD:
        dx, dlns, dlnb, dw1, db1, dw2, db2 = _ff_bwd_wide(
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


_fused_geglu_ff_local.defvjp(_vjp_fwd, _vjp_bwd)
