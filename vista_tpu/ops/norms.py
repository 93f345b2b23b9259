"""Fused Pallas TPU LayerNorm (the transformers' pre-matmul norms).

Why this exists: on the 576x1024 denoise step XLA fuses the fp32 LayerNorm
*into* the consuming q/k/v/FF matmuls, which then rematerialize the
normalization per output tile — the fused ops run at 16-43 TF/s instead of
the ~150-200 TF/s the clean matmuls reach (measured, tools/xprof.py). This
kernel materializes the normalized bf16 tensor in one pass (1 read + 1
write at HBM bandwidth) and keeps the matmuls unpolluted.

A fused GroupNorm+SiLU kernel was prototyped and benchmarked too: XLA's own
GroupNorm lowering (stats at ~730 GB/s, fused apply) beat it at every UNet
shape, so GroupNorm32 stays on XLA.

Numerics match ``flax.linen.LayerNorm`` with fp32 stats (mean-of-squares
minus squared-mean, same eps placement); parity in tests/test_norms.py.

Reference counterpart: vwm/modules/attention.py:424-524 (the pre-LN
transformer blocks); torch leaves the fusion to cuDNN/Inductor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# fp32 working-set target per tile (elements); keeps VMEM under control
_TILE_ELEMS = 1 << 18


def _row_tile(s: int, c: int) -> int:
    """Largest power-of-2 divisor of ``s`` under the VMEM target (or ``s``
    itself when small). Always >= 1 (worst case: one row per grid step)."""
    target = max(_TILE_ELEMS // max(c, 1), 8)
    if s <= target:
        return s
    best = 1
    t = 1
    while t <= target:
        if s % t == 0:
            best = t
        t *= 2
    return best


# --------------------------------------------------------------------------
# LayerNorm
# --------------------------------------------------------------------------


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)  # (tile, C) or (tile, M, C)
    c = xf.shape[-1]
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * g_ref[...] + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_local(x: Array, gamma: Array, beta: Array, eps: float = 1e-5) -> Array:
    return _layer_norm_fwd_impl(x, gamma, beta, eps)


def layer_norm(x: Array, gamma: Array, beta: Array, eps: float = 1e-5) -> Array:
    """Row LayerNorm over the minor dim with fp32 stats; 1 read + 1 write.

    Shape-preserving and reshape-free: a rank-3 input (e.g. the temporal
    stack's ``(b*s, t, c)`` with t=25) is tiled over its leading dim
    directly — flattening it first would be a real relayout copy on TPU
    because the middle dim is sublane-padded (25 -> 32).

    Backward: XLA-recompute VJP (a raw pallas_call has no autodiff rule —
    without this, any TPU training step through the pallas LN fails to
    linearize).

    Rows are independent; under ``parallel.kernel_sharding`` the leading dim
    runs as a zero-collective shard_map island."""
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    return shard_kernel(
        lambda x, g, b: _layer_norm_local(x, g, b, eps),
        (0, None, None), 0, x, gamma, beta)


def _layer_norm_xla(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


def _layer_norm_vjp_fwd(x, gamma, beta, eps):
    return _layer_norm_fwd_impl(x, gamma, beta, eps), (x, gamma, beta)


def _layer_norm_vjp_bwd(eps, residuals, g):
    x, gamma, beta = residuals
    _, vjp = jax.vjp(lambda *a: _layer_norm_xla(*a, eps=eps), x, gamma, beta)
    return vjp(g)


def _layer_norm_fwd_impl(x: Array, gamma: Array, beta: Array, eps: float) -> Array:
    orig_shape = x.shape
    c = x.shape[-1]
    # rank-3 only when the (rows, mid, c) -> (rows*mid, c) flatten would be a
    # real relayout (sublane-unaligned mid). Aligned mids flatten for free and
    # the 2-D path tiles much tighter (the 3-D block is all-of-mid per tile,
    # which blows scoped VMEM at e.g. (50, 576, 1280)).
    if x.ndim == 3 and x.shape[1] % 8 != 0 and x.shape[1] * c <= 4 * _TILE_ELEMS:
        rows, mid = x.shape[0], x.shape[1]
        x_in = x
        block = lambda tile: (tile, mid, c)
        param_block = (1, 1, c)
        param_shape = (1, 1, c)
        per_row = mid * c
    else:
        rows = x.size // c
        mid = 1
        x_in = x.reshape(rows, c)
        block = lambda tile: (tile, c)
        param_block = (1, c)
        param_shape = (1, c)
        per_row = c

    tile = _row_tile(rows, per_row)  # a divisor of rows, always >= 1
    n_tiles = rows // tile

    g2 = gamma.astype(jnp.float32).reshape(param_shape)
    b2 = beta.astype(jnp.float32).reshape(param_shape)
    zero_tail = (lambda t: (t, 0, 0)) if x_in.ndim == 3 else (lambda t: (t, 0))
    param_map = (lambda t: (0, 0, 0)) if x_in.ndim == 3 else (lambda t: (0, 0))

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(block(tile), zero_tail),
            pl.BlockSpec(param_block, param_map),
            pl.BlockSpec(param_block, param_map),
        ],
        out_specs=pl.BlockSpec(block(tile), zero_tail),
        out_shape=jax.ShapeDtypeStruct(x_in.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # fp32 stat transients exceed the default scoped limit on wide blocks
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * per_row,
            bytes_accessed=2 * rows * per_row * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_in, g2, b2)
    return out.reshape(orig_shape)


_layer_norm_local.defvjp(_layer_norm_vjp_fwd, _layer_norm_vjp_bwd)
