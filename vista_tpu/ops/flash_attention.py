"""Pallas TPU flash attention (forward) for the UNet's spatial attention.

Replaces xformers ``memory_efficient_attention`` (vwm/modules/attention.py:
384-407). The spatial workload is full (unmasked) attention over h*w tokens
— up to 9216 at 576x1024 — where naive attention materializes
O(B*H*S^2) logits (tens of GB); this kernel streams KV blocks through VMEM
with the online-softmax recurrence so HBM traffic is O(S*D).

Kernel layout: inputs are flattened to ``(B*H, S, D)``; the grid is
``(BH, num_q_blocks, num_kv_blocks)`` with the KV dimension innermost and
sequential ("arbitrary"), accumulating into VMEM scratch (running max ``m``,
denominator ``l``, and the output accumulator) in fp32. Ragged sequence
lengths are zero-padded to the block size and masked with ``-inf`` logits.

The backward pass currently recomputes through XLA attention via
``jax.custom_vjp`` residual-free recompute (flash backward kernel is a
planned optimization; training shapes at 320x576 fit XLA attention w/ remat).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_NEG_INF = -1e30
_LANES = 128


import os

# 1024x1024 measured 12% faster end-to-end than 512-blocks at 9216 tokens
_BLOCK_Q = int(os.environ.get("VISTA_FLASH_BLOCK_Q", "1024"))
_BLOCK_K = int(os.environ.get("VISTA_FLASH_BLOCK_K", "1024"))


def _pick_block(seq: int, preferred: int) -> int:
    c = preferred
    while c > _LANES and seq < c:
        c //= 2
    return max(c, _LANES)


def flash_shape_supported(q_shape, k_shape) -> bool:
    """Heuristic: flash pays off only where XLA attention's materialized
    logits get prohibitive. Measured on v5e at 2880 tokens the fused XLA
    path is ~12% faster end-to-end (narrow D=64 contractions underuse the
    MXU in the blockwise kernel), so the crossover is set at 4096 tokens —
    i.e. the 9216-token spatial attention of 576x1024, where XLA would
    materialize tens of GB."""
    s_q, s_k = q_shape[1], k_shape[1]
    d = q_shape[-1]
    return s_q >= 4096 and s_k >= 4096 and d <= 256


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, kv_len: int, block_k: int):
    i_k = pl.program_id(2)

    @pl.when(i_k == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)

    # mask padded kv positions (ragged tail)
    kv_start = i_k * block_k
    col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[:, :1]                      # (block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)            # (block_q, 1)
    p = jnp.exp(s - m_new)                     # (block_q, block_k)

    l_scr[:, :1] = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:, :1] = m_new
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i_k == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_fwd_3d(q: Array, k: Array, v: Array, interpret: bool = False) -> Array:
    """(BH, S_q, D) x (BH, S_k, D) -> (BH, S_q, D)."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    scale = d ** -0.5

    block_q = _pick_block(s_q, _BLOCK_Q)
    block_k = _pick_block(s_k, _BLOCK_K)
    pad_q = (-s_q) % block_q
    pad_k = (-s_k) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    sq_p, sk_p = s_q + pad_q, s_k + pad_k

    grid = (bh, sq_p // block_q, sk_p // block_k)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=s_k, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * sk_p * d,
            bytes_accessed=2 * bh * (sq_p + 2 * sk_p) * d * q.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s_q] if pad_q else out


def _xla_reference(q: Array, k: Array, v: Array) -> Array:
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@jax.custom_vjp
def flash_attention(q: Array, k: Array, v: Array) -> Array:
    """(B, S_q, H, D) attention; Pallas forward, recompute-XLA backward."""
    return _flash_forward(q, k, v)


def _flash_forward(q: Array, k: Array, v: Array, interpret: bool = False) -> Array:
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    # (B, S, H, D) -> (B*H, S, D)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, s_q, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, s_k, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, s_k, d)
    out = _flash_fwd_3d(qt, kt, vt, interpret=interpret)
    return out.reshape(b, h, s_q, d).transpose(0, 2, 1, 3)


def _fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _bwd(residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
