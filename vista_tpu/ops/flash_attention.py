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

The backward pass is also blockwise Pallas (two kernels: dQ with KV
streamed; dK/dV with Q streamed), using the saved per-row logsumexp — full
-res 576x1024 *training* would otherwise materialize 9216^2 logits in the
VJP. Padded-query rows are harmless in the backward (their dO and D are
zero); padded-KV columns are re-masked to p=0.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
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
        # per-row logsumexp, the backward residual ((block_q, 1) lane layout:
        # TPU blocks need the last dim divisible by 128 OR equal to the
        # array dim, so the lse array carries a trailing singleton)
        lse_ref[0] = m_scr[:, :1] + jnp.log(l_scr[:, :1])


def _flash_fwd_3d(
    q: Array, k: Array, v: Array, interpret: bool = False
) -> Tuple[Array, Array]:
    """(BH, S_q, D) x (BH, S_k, D) -> ((BH, S_q, D) out, (BH, S_q) lse)."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    scale = d ** -0.5
    interpret = interpret or jax.default_backend() != "tpu"

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

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=s_k, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq_p, 1), jnp.float32),
        ],
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
    lse = lse[..., 0]
    if pad_q:
        out, lse = out[:, :s_q], lse[:, :s_q]
    return out, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, dq_scr, *,
                   scale: float, kv_len: int, block_k: int):
    i_k = pl.program_id(2)

    @pl.when(i_k == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0]  # (block_q, 1)
    dd = dd_ref[0]    # (block_q, 1) rowsum(dO * O)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)
    col = i_k * block_k + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p = jnp.where(col < kv_len, p, 0.0)

    dp = jax.lax.dot_general(  # dO V^T: (block_q, block_k)
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dd) * scale
    dq_scr[:] += jax.lax.dot_general(  # dS K: (block_q, d)
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i_k == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *,
                    scale: float, kv_len: int, block_k: int):
    i_q = pl.program_id(2)

    @pl.when(i_q == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0]  # (block_q, 1)
    dd = dd_ref[0]    # (block_q, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # (block_q, block_k)
    col = (pl.program_id(1) * block_k
           + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1))
    p = jnp.where(col < kv_len, p, 0.0)
    # padded q rows need no mask: their dO and D are zero, so both the dV
    # (P^T dO) and dK (dS^T Q, dS = P*(dP-D)) contributions vanish.

    dv_scr[:] += jax.lax.dot_general(  # P^T dO: (block_k, d)
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dd) * scale
    dk_scr[:] += jax.lax.dot_general(  # dS^T Q: (block_k, d)
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i_q == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _xla_reference(q: Array, k: Array, v: Array) -> Array:
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@jax.custom_vjp
def flash_attention(q: Array, k: Array, v: Array) -> Array:
    """(B, S_q, H, D) attention; Pallas forward AND blockwise Pallas backward."""
    return _flash_forward(q, k, v)


def _to_3d(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_3d(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _flash_forward(q: Array, k: Array, v: Array, interpret: bool = False) -> Array:
    out, _ = _flash_fwd_3d(_to_3d(q), _to_3d(k), _to_3d(v), interpret=interpret)
    return _from_3d(out, q.shape[0], q.shape[2])


def _fwd(q, k, v):
    qt, kt, vt = _to_3d(q), _to_3d(k), _to_3d(v)
    out, lse = _flash_fwd_3d(qt, kt, vt)
    b, h = q.shape[0], q.shape[2]
    return _from_3d(out, b, h), (qt, kt, vt, out, lse, b, h)


def _bwd(residuals, g):
    qt, kt, vt, out, lse, b, h = residuals
    do = _to_3d(g)
    bh, s_q, d = qt.shape
    s_k = kt.shape[1]
    scale = d ** -0.5
    interpret = jax.default_backend() != "tpu"

    # D_i = rowsum(dO * O) — cheap elementwise reduce, leave it to XLA.
    # lse/dd carry a trailing singleton lane dim for the TPU block layout.
    dd = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    lse3, dd3 = lse[..., None], dd[..., None]

    block_q = _pick_block(s_q, _BLOCK_Q)
    block_k = _pick_block(s_k, _BLOCK_K)
    pad_q = (-s_q) % block_q
    pad_k = (-s_k) % block_k
    if pad_q:
        pq = ((0, 0), (0, pad_q), (0, 0))
        qt, do = jnp.pad(qt, pq), jnp.pad(do, pq)
        lse3, dd3 = jnp.pad(lse3, pq), jnp.pad(dd3, pq)
    if pad_k:
        pk = ((0, 0), (0, pad_k), (0, 0))
        kt, vt = jnp.pad(kt, pk), jnp.pad(vt, pk)
    sq_p, sk_p = s_q + pad_q, s_k + pad_k
    n_q, n_k = sq_p // block_q, sk_p // block_k

    q_spec = pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0))
    kv_spec_j = pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0))
    row_spec = pl.BlockSpec((1, block_q, 1), lambda b_, i, j: (b_, i, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=s_k, block_k=block_k),
        grid=(bh, n_q, n_k),
        in_specs=[q_spec, kv_spec_j, kv_spec_j, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), qt.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * sq_p * sk_p * d,
            bytes_accessed=2 * bh * (2 * sq_p + 2 * sk_p) * d * qt.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p),
        interpret=interpret,
    )(qt, kt, vt, do, lse3, dd3)

    # dK/dV: iterate q blocks innermost, k blocks parallel
    q_spec_i = pl.BlockSpec((1, block_q, d), lambda b_, j, i: (b_, i, 0))
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0))
    row_spec_i = pl.BlockSpec((1, block_q, 1), lambda b_, j, i: (b_, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=s_k, block_k=block_k),
        grid=(bh, n_k, n_q),
        in_specs=[q_spec_i, kv_spec, kv_spec, q_spec_i, row_spec_i, row_spec_i],
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct((bh, sk_p, d), kt.dtype),
                   jax.ShapeDtypeStruct((bh, sk_p, d), vt.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * sq_p * sk_p * d,
            bytes_accessed=2 * bh * (2 * sq_p + 2 * sk_p) * d * qt.dtype.itemsize,
            transcendentals=bh * sq_p * sk_p),
        interpret=interpret,
    )(qt, kt, vt, do, lse3, dd3)

    dq = dq[:, :s_q] if pad_q else dq
    dk = dk[:, :s_k] if pad_k else dk
    dv = dv[:, :s_k] if pad_k else dv
    return _from_3d(dq, b, h), _from_3d(dk, b, h), _from_3d(dv, b, h)


flash_attention.defvjp(_fwd, _bwd)
