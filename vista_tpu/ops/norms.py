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
    """Largest divisor of ``s`` that is a power of two times <= target size
    (or ``s`` itself when small). Returns 0 when no usable divisor exists."""
    target = max(_TILE_ELEMS // max(c, 1), 8)
    if s <= target:
        return s
    best = 0
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
    xf = x_ref[:].astype(jnp.float32)  # (tile, C)
    c = xf.shape[1]
    mean = jnp.sum(xf, axis=1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=1, keepdims=True) / c - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[:] + b_ref[:]).astype(o_ref.dtype)


def layer_norm(x: Array, gamma: Array, beta: Array, eps: float = 1e-5) -> Array:
    """Row LayerNorm over the minor dim with fp32 stats; 1 read + 1 write."""
    orig_shape = x.shape
    c = x.shape[-1]
    rows = x.size // c
    x2 = x.reshape(rows, c)

    tile = _row_tile(rows, c)
    pad = 0
    if tile == 0 or rows % tile:
        tile = min(max(_TILE_ELEMS // max(c, 1), 8), rows) if tile == 0 else tile
        pad = (-rows) % tile
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n_tiles = (rows + pad) // tile

    g2 = gamma.astype(jnp.float32).reshape(1, c)
    b2 = beta.astype(jnp.float32).reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda t: (t, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((rows + pad, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * (rows + pad) * c,
            bytes_accessed=2 * (rows + pad) * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, g2, b2)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)
