"""Pallas TPU flash attention (fwd + bwd) for the UNet's spatial attention.

Replaces xformers ``memory_efficient_attention`` (vwm/modules/attention.py:
384-407). The spatial workload is full (unmasked) attention over h*w tokens
— up to 9216 at 576x1024 — where naive attention materializes
O(B*H*S^2) logits (tens of GB); this kernel streams KV blocks through VMEM
with the online-softmax recurrence so HBM traffic is O(S*D).

Layout (TPU-first): the kernel consumes the projections' natural packed
layout ``(B, S, heads*dim_head)`` directly. Blocks span the full packed
minor dim (Mosaic requires lane dims divisible by 128 or whole; head_dim 64
is neither) and a static head loop inside the kernel slices 64-lane strips
per head. Benefits over the torch-style (B,H,S,D) layout: the head
split/transpose relayouts (~50ms/eval at 576x1024) never happen, DMA runs
at full lane width, and each K/V block is fetched once for ALL heads.
Per-head online-softmax state (m, l) lives in one (block_q, 128) scratch,
one lane per head.

Masking: the ragged-tail mask (iota + compare + select per logit tile) is
only compiled in when the sequence doesn't divide the block size; the
headline shapes divide evenly and the kernel is VPU-bound on the softmax,
so dead masking costs real time.

The backward is also blockwise Pallas (dQ with KV streamed; dK/dV with Q
streamed) using the saved per-row logsumexp; the ``D = rowsum(dO*O)``
residual is computed in-kernel from blocks already resident in VMEM.
Padded-query rows are harmless (their dO is zero); padded-KV columns are
re-masked to p=0. Backward blocks are halved (512) to keep the fp32 logit
transients of the head loop inside VMEM.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_NEG_INF = -1e30
_LANES = 128
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453

# headline-bench sweep: 1536x1536 > 1024x1024 (0.6118 vs 0.6097 f/s) >
# 512x1024 (0.5981) at 9216 tokens; isolated-kernel sweeps DISAGREE with
# in-model results here — trust only bench.py for block picks
_BLOCK_Q = int(os.environ.get("VISTA_FLASH_BLOCK_Q", "1536"))
_BLOCK_K = int(os.environ.get("VISTA_FLASH_BLOCK_K", "1536"))
_BLOCK_BWD = int(os.environ.get("VISTA_FLASH_BLOCK_BWD", "512"))
# the unrolled head loop keeps one fp32 logit tile per head on the Mosaic
# stack; the 16MB default scoped-vmem limit is too small for 5 heads at
# 1024x1024 blocks (v5e VMEM is 128MB — jax's own TPU flash kernel raises
# this limit the same way)
_VMEM_LIMIT = int(os.environ.get("VISTA_FLASH_VMEM_MB", "100")) * 1024 * 1024


def _pick_block(seq: int, preferred: int) -> int:
    """Largest block <= preferred that divides ``seq`` as a multiple of 128
    lanes (avoids both padding copies and the ragged-tail mask); falls back
    to the nearest power-of-two block (with padding) when no aligned divisor
    exists."""
    c = preferred
    while c > _LANES and seq < c:
        c //= 2
    if seq > c:
        for cand in range(c, _LANES - 1, -_LANES):
            if seq % cand == 0:
                return cand
    return c


def flash_shape_supported(q_shape, k_shape) -> bool:
    """Heuristic: flash pays off only where XLA attention's materialized
    logits get prohibitive. Measured on v5e at 2880 tokens the fused XLA
    path was ~12% faster end-to-end than the original kernel (narrow D=64
    contractions underuse the MXU); with the mask-free packed-layout path
    the crossover is at 2048 tokens, covering the 9216- and 2304-token
    spatial attention of 576x1024 (see tools/attnbench.py). d up to 512
    covers the VAE mid-block single-head attention."""
    s_q, s_k = q_shape[1], k_shape[1]
    d = q_shape[-1]
    return s_q >= 2048 and s_k >= 2048 and d <= 512


def _hs(h: int, d: int) -> slice:
    return slice(h * d, (h + 1) * d)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *refs,
                  kv_len: int, block_k: int, masked: bool,
                  heads: int, d: int, want_lse: bool):
    # base-2 softmax: q arrives pre-scaled by scale*log2(e), so the logits
    # are already in exp2 domain — saves the per-logit scale multiply AND
    # exp's internal log2e multiply on the VPU, which co-bounds this kernel
    # at d=64 (7 -> 5 elementwise ops per logit, ~21G logits per ds1 site)
    lse_ref, scratches = (refs[0], refs[1:]) if want_lse else (None, refs)
    m_scr, l_scr, acc_scr = scratches
    i_k = pl.program_id(2)

    @pl.when(i_k == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, heads*d)
    k = k_ref[0]  # (block_k, heads*d)
    v = v_ref[0]

    col = None
    if masked:  # ragged kv tail only; compiled out on aligned shapes
        col = (i_k * block_k
               + jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], block_k), 1))

    for h in range(heads):
        s = jax.lax.dot_general(
            q[:, _hs(h, d)], k[:, _hs(h, d)],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (block_q, block_k), base-2 domain (q pre-scaled)
        if masked:
            s = jnp.where(col < kv_len, s, _NEG_INF)

        m_prev = m_scr[:, h:h + 1]                 # (block_q, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)           # (block_q, 1)
        p = jnp.exp2(s - m_new)                    # (block_q, block_k)

        l_scr[:, h:h + 1] = alpha * l_scr[:, h:h + 1] + jnp.sum(
            p, axis=-1, keepdims=True)
        m_scr[:, h:h + 1] = m_new
        acc_scr[:, _hs(h, d)] = acc_scr[:, _hs(h, d)] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v[:, _hs(h, d)], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i_k == pl.num_programs(2) - 1)
    def _finalize():
        for h in range(heads):
            o_ref[0, :, _hs(h, d)] = (
                acc_scr[:, _hs(h, d)] / l_scr[:, h:h + 1]).astype(o_ref.dtype)
            if lse_ref is not None:
                # per-row logsumexp in NATURAL units (m is base-2; l is the
                # same sum either way), the backward residual (trailing
                # singleton lane dim for the TPU block layout)
                lse_ref[0, h] = (m_scr[:, h:h + 1] * _LN2
                                 + jnp.log(l_scr[:, h:h + 1]))


def _pad_seq(x: Array, pad: int) -> Array:
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x


def _flash_fwd_packed(
    q: Array, k: Array, v: Array, num_heads: int, interpret: bool = False,
    want_lse: bool = True,
):
    """(B, S_q, H*D) x (B, S_k, H*D) -> ((B, S_q, H*D) out, (B, H, S_q, 1) lse)
    when ``want_lse`` (the VJP residual path), else just ``out`` — the
    inference path skips the lse buffers and writes entirely."""
    b, s_q, hd = q.shape
    s_k = k.shape[1]
    d = hd // num_heads
    scale = d ** -0.5
    interpret = interpret or jax.default_backend() != "tpu"

    block_q = _pick_block(s_q, _BLOCK_Q)
    block_k = _pick_block(s_k, _BLOCK_K)
    pad_q = (-s_q) % block_q
    pad_k = (-s_k) % block_k
    # pre-scale q into the base-2 softmax domain (one cheap XLA pass; the
    # kernel then skips two VPU ops per logit — see _flash_kernel)
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    q = _pad_seq(q, pad_q)
    k, v = _pad_seq(k, pad_k), _pad_seq(v, pad_k)
    sq_p, sk_p = s_q + pad_q, s_k + pad_k

    grid = (b, sq_p // block_q, sk_p // block_k)
    assert num_heads <= _LANES, "per-head m/l state is one lane per head"

    out_specs = [pl.BlockSpec((1, block_q, hd), lambda bb, i, j: (bb, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype)]
    if want_lse:
        out_specs.append(
            pl.BlockSpec((1, num_heads, block_q, 1), lambda bb, i, j: (bb, 0, i, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((b, num_heads, sq_p, 1), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=s_k,
                          block_k=block_k, masked=bool(pad_k),
                          heads=num_heads, d=d, want_lse=want_lse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bb, i, j: (bb, j, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bb, i, j: (bb, j, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq_p * sk_p * hd,
            bytes_accessed=2 * b * (sq_p + 2 * sk_p) * hd * q.dtype.itemsize,
            transcendentals=b * num_heads * sq_p * sk_p,
        ),
        interpret=interpret,
    )(q, k, v)
    if not want_lse:
        out = res[0]
        return out[:, :s_q] if pad_q else out
    out, lse = res
    if pad_q:
        out, lse = out[:, :s_q], lse[:, :, :s_q]
    return out, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref,
                   dq_scr, dd_scr, *, scale: float, kv_len: int,
                   block_k: int, masked: bool, heads: int, d: int):
    i_k = pl.program_id(2)

    @pl.when(i_k == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)
        # D_i = rowsum(dO_h * O_h), from the blocks already in VMEM
        do_f = do_ref[0].astype(jnp.float32)
        o_f = o_ref[0].astype(jnp.float32)
        for h in range(heads):
            dd_scr[:, h:h + 1] = jnp.sum(
                do_f[:, _hs(h, d)] * o_f[:, _hs(h, d)], axis=-1, keepdims=True)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]

    col = None
    if masked:
        col = (i_k * block_k
               + jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], block_k), 1))

    for h in range(heads):
        s = jax.lax.dot_general(
            q[:, _hs(h, d)], k[:, _hs(h, d)],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse_ref[0, h])
        if masked:
            p = jnp.where(col < kv_len, p, 0.0)

        dp = jax.lax.dot_general(  # dO V^T: (block_q, block_k)
            do[:, _hs(h, d)], v[:, _hs(h, d)],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - dd_scr[:, h:h + 1]) * scale
        dq_scr[:, _hs(h, d)] += jax.lax.dot_general(  # dS K: (block_q, d)
            ds.astype(k.dtype), k[:, _hs(h, d)], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i_k == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *,
                    scale: float, kv_len: int, block_k: int, masked: bool,
                    heads: int, d: int):
    i_q = pl.program_id(2)

    @pl.when(i_q == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    do_f = do.astype(jnp.float32)
    o_f = o_ref[0].astype(jnp.float32)

    col = None
    if masked:
        col = (pl.program_id(1) * block_k
               + jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], block_k), 1))

    for h in range(heads):
        dd = jnp.sum(do_f[:, _hs(h, d)] * o_f[:, _hs(h, d)],
                     axis=-1, keepdims=True)
        s = jax.lax.dot_general(
            q[:, _hs(h, d)], k[:, _hs(h, d)],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse_ref[0, h])  # (block_q, block_k)
        if masked:
            p = jnp.where(col < kv_len, p, 0.0)
        # padded q rows need no mask: their dO and D are zero, so both the dV
        # (P^T dO) and dK (dS^T Q, dS = P*(dP-D)) contributions vanish.

        dv_scr[:, _hs(h, d)] += jax.lax.dot_general(  # P^T dO: (block_k, d)
            p.astype(do.dtype), do[:, _hs(h, d)], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do[:, _hs(h, d)], v[:, _hs(h, d)],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - dd) * scale
        dk_scr[:, _hs(h, d)] += jax.lax.dot_general(  # dS^T Q: (block_k, d)
            ds.astype(q.dtype), q[:, _hs(h, d)], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i_q == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_packed(q, k, v, out, lse, g, num_heads):
    b, s_q, hd = q.shape
    s_k = k.shape[1]
    d = hd // num_heads
    scale = d ** -0.5
    interpret = jax.default_backend() != "tpu"

    block_q = _pick_block(s_q, _BLOCK_BWD)
    block_k = _pick_block(s_k, _BLOCK_BWD)
    pad_q = (-s_q) % block_q
    pad_k = (-s_k) % block_k
    qp, dop, op = _pad_seq(q, pad_q), _pad_seq(g, pad_q), _pad_seq(out, pad_q)
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_q), (0, 0))) if pad_q else lse
    kp, vp = _pad_seq(k, pad_k), _pad_seq(v, pad_k)
    sq_p, sk_p = s_q + pad_q, s_k + pad_k
    n_q, n_k = sq_p // block_q, sk_p // block_k

    kw = dict(scale=scale, kv_len=s_k, block_k=block_k, masked=bool(pad_k),
              heads=num_heads, d=d)
    q_spec = pl.BlockSpec((1, block_q, hd), lambda bb, i, j: (bb, i, 0))
    kv_spec_j = pl.BlockSpec((1, block_k, hd), lambda bb, i, j: (bb, j, 0))
    row_spec = pl.BlockSpec((1, num_heads, block_q, 1), lambda bb, i, j: (bb, 0, i, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid=(b, n_q, n_k),
        in_specs=[q_spec, kv_spec_j, kv_spec_j, q_spec, q_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32),
                        pltpu.VMEM((block_q, _LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * sq_p * sk_p * hd,
            bytes_accessed=2 * b * (3 * sq_p + 2 * sk_p) * hd * q.dtype.itemsize,
            transcendentals=b * num_heads * sq_p * sk_p),
        interpret=interpret,
    )(qp, kp, vp, dop, op, lsep)

    # dK/dV: iterate q blocks innermost, k blocks parallel
    q_spec_i = pl.BlockSpec((1, block_q, hd), lambda bb, j, i: (bb, i, 0))
    kv_spec = pl.BlockSpec((1, block_k, hd), lambda bb, j, i: (bb, j, 0))
    row_spec_i = pl.BlockSpec((1, num_heads, block_q, 1), lambda bb, j, i: (bb, 0, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kw),
        grid=(b, n_k, n_q),
        in_specs=[q_spec_i, kv_spec, kv_spec, q_spec_i, q_spec_i, row_spec_i],
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct((b, sk_p, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, sk_p, hd), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, hd), jnp.float32),
                        pltpu.VMEM((block_k, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * sq_p * sk_p * hd,
            bytes_accessed=2 * b * (3 * sq_p + 2 * sk_p) * hd * q.dtype.itemsize,
            transcendentals=b * num_heads * sq_p * sk_p),
        interpret=interpret,
    )(qp, kp, vp, dop, op, lsep)

    dq = dq[:, :s_q] if pad_q else dq
    dk = dk[:, :s_k] if pad_k else dk
    dv = dv[:, :s_k] if pad_k else dv
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_packed_local(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    return _flash_fwd_packed(q, k, v, num_heads, want_lse=False)


def _packed_fwd(q, k, v, num_heads):
    out, lse = _flash_fwd_packed(q, k, v, num_heads)
    return out, (q, k, v, out, lse)


def _packed_bwd(num_heads, residuals, g):
    q, k, v, out, lse = residuals
    return _flash_bwd_packed(q, k, v, out, lse, g, num_heads)


_flash_attention_packed_local.defvjp(_packed_fwd, _packed_bwd)


def flash_attention_packed(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    """Attention on packed ``(B, S, heads*dim_head)`` tensors — the dense
    projections' natural layout; no head split/transpose relayouts.

    Under an active ``parallel.kernel_sharding`` context the batch dim runs
    as a shard_map island (each chip executes the unmodified single-chip
    kernel on its local rows — attention rows are independent, so this is
    exact with zero collectives)."""
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    return shard_kernel(
        lambda q, k, v: _flash_attention_packed_local(q, k, v, num_heads),
        (0, 0, 0), 0, q, k, v)


# ---- legacy 4D (B, S, H, D) entry (tests, sp_attention interop) ----


def _xla_reference(q: Array, k: Array, v: Array) -> Array:
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def flash_attention(q: Array, k: Array, v: Array) -> Array:
    """(B, S, H, D) attention via the packed kernel (one relayout each way)."""
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    out = flash_attention_packed(
        q.reshape(b, s_q, h * d), k.reshape(b, s_k, h * d),
        v.reshape(b, s_k, h * d), h)
    return out.reshape(b, s_q, h, d)


def _flash_forward(q: Array, k: Array, v: Array, interpret: bool = False) -> Array:
    """Test hook: forward-only on (B, S, H, D)."""
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    out = _flash_fwd_packed(
        q.reshape(b, s_q, h * d), k.reshape(b, s_k, h * d),
        v.reshape(b, s_k, h * d), h, interpret=interpret, want_lse=False)
    return out.reshape(b, s_q, h, d)
