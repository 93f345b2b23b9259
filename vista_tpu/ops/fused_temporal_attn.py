"""Fully-fused temporal self-attention Pallas kernel.

The temporal blocks' first attention is ``x = x + to_out(attn(q,k,v))`` with
``q/k/v = to_{q,k,v}(LN(x))`` over only t=25 frame tokens per row
(reference video_attention.py:12-144). Composed from separate ops this costs
eight-plus HBM round trips of the (b*h*w, 25, c) tensor per block (LN, three
projections, the attention kernel in/out, out-proj, residual) plus layout
copies between the XLA dots and the Pallas tiny-attention kernel's row-major
operand constraint (measured ~20ms/eval of pure relayouts).

This kernel reads x once per tile and does the whole chain in VMEM:
fp32-stat LN -> q/k/v matmuls (weights VMEM-resident across grid steps) ->
per-head fp32-softmax attention over t -> out projection (+bias) ->
residual add -> one write. The (g, t, c) -> (g*t, c) flatten happens on the
VMEM block, where the t=25 sublane padding costs a shuffle instead of an
HBM relayout.

Backward: a second Pallas kernel mirroring the forward's fusion — the XLA
recompute VJP rode the same ~2 TF/s batched-matmul path (tiny (t, d)
matmuls, layout copies) the forward kernel exists to escape, roughly
tripled. Per row-group the whole chain (LN recompute, q/k/v, per-head
softmax backward, out-proj grads, LN backward) runs in VMEM; parameter
grads accumulate in grid-resident fp32 blocks. The XLA VJP remains as a
monkeypatch-able fallback (``_PALLAS_BWD = False``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_VMEM_LIMIT = 100 * 1024 * 1024


def fused_temporal_attn_supported(t: int, c: int, inner: int) -> bool:
    # t must be sublane-aligned: the in-VMEM (g, t, c) -> (g*t, c) flatten is
    # only a legal Mosaic shape cast when t % 8 == 0 (callers pad t=25 -> 32
    # and pass valid_t=25; the hardware tiles 25 -> 32 physically anyway)
    return t <= 64 and t % 8 == 0 and c % 8 == 0 and inner % 8 == 0


def _kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
            o_ref, *, eps: float, heads: int, d: int, scale: float,
            valid_t: int):
    x0 = x_ref[...]               # (g, t, c)
    g, t, c = x0.shape
    x2 = x0.reshape(g * t, c)

    xf = x2.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * lns_ref[...]
          + lnb_ref[...]).astype(x0.dtype)

    def proj(w_ref):
        return jax.lax.dot_general(
            xn, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x0.dtype)

    inner = wq_ref.shape[1]
    q3 = proj(wq_ref).reshape(g, t, inner)
    k3 = proj(wk_ref).reshape(g, t, inner)
    v3 = proj(wv_ref).reshape(g, t, inner)

    mask = None
    if valid_t < t:  # padded frame slots: exclude their keys from softmax
        col = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 2)
        mask = col >= valid_t

    outs = []
    for h in range(heads):
        hs = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q3[..., hs], k3[..., hs], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (g, t, t)
        if mask is not None:
            s = jnp.where(mask, -1e30, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v3.dtype), v3[..., hs], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x0.dtype))
    o3 = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)

    y = jax.lax.dot_general(
        o3.reshape(g * t, inner), wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[...]
    o_ref[...] = (xf + y).astype(o_ref.dtype).reshape(g, t, c)


def _xla_reference(x, ln_s, ln_b, wq, wk, wv, wo, bo, num_heads,
                   valid_t=None, eps=1e-5):
    rows, t, c = x.shape
    inner = wq.shape[1]
    d = inner // num_heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * ln_s + ln_b).astype(x.dtype)
    q = (xn @ wq.astype(x.dtype)).reshape(rows, t, num_heads, d)
    k = (xn @ wk.astype(x.dtype)).reshape(rows, t, num_heads, d)
    v = (xn @ wv.astype(x.dtype)).reshape(rows, t, num_heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    if valid_t is not None and valid_t < t:
        key_pad = jnp.arange(t) >= valid_t
        logits = jnp.where(key_pad[None, None, None, :], -1e30, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(rows, t, inner)
    y = (o @ wo.astype(x.dtype)).astype(jnp.float32) + bo
    return (xf + y).astype(x.dtype)


def _fwd(x, ln_s, ln_b, wq, wk, wv, wo, bo, num_heads, valid_t, eps):
    rows, t, c = x.shape
    inner = wq.shape[1]
    d = inner // num_heads

    # q/k/v/logit transients scale with g*t*inner; 12MB target (g=256 at the
    # UNet widths) measured 2.9x faster than 6MB/g=128 — the small-g grid is
    # step-overhead-bound; beyond 12MB it's flat (78 GB/s)
    target = max((12 << 20) // max(t * inner * 4, 1), 1)
    g = 1
    cand = 1
    while cand <= target:
        if rows % cand == 0:
            g = cand
        cand *= 2

    dt = x.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, heads=num_heads, d=d,
                          scale=d ** -0.5, valid_t=valid_t),
        grid=(rows // g,),
        in_specs=[
            pl.BlockSpec((g, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, inner), lambda i: (0, 0)),
            pl.BlockSpec((c, inner), lambda i: (0, 0)),
            pl.BlockSpec((c, inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, t, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=rows * t * (8 * c * inner + 4 * t * inner),
            bytes_accessed=2 * rows * t * c * dt.itemsize,
            transcendentals=rows * num_heads * t * t,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x,
      ln_s.astype(jnp.float32).reshape(1, c), ln_b.astype(jnp.float32).reshape(1, c),
      wq.astype(dt), wk.astype(dt), wv.astype(dt), wo.astype(dt),
      bo.astype(jnp.float32).reshape(1, c))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused_temporal_self_attn_local(x: Array, ln_s: Array, ln_b: Array,
                                    wq: Array, wk: Array, wv: Array,
                                    wo: Array, bo: Array,
                                    num_heads: int, valid_t: int,
                                    eps: float = 1e-5) -> Array:
    return _fwd(x, ln_s, ln_b, wq, wk, wv, wo, bo, num_heads, valid_t, eps)


def fused_temporal_self_attn(x: Array, ln_s: Array, ln_b: Array,
                             wq: Array, wk: Array, wv: Array,
                             wo: Array, bo: Array,
                             num_heads: int, valid_t: int,
                             eps: float = 1e-5) -> Array:
    """``x + to_out(selfattn(to_qkv(LN(x))))`` over the t axis, one pass.

    ``valid_t``: number of real frame tokens; key positions >= valid_t
    (sublane padding) are masked out of the softmax. Outputs at padded
    query rows are garbage and must be sliced off by the caller.

    Rows (spatial locations) are independent; under
    ``parallel.kernel_sharding`` the row dim runs as a shard_map island."""
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    return shard_kernel(
        lambda *a: _fused_temporal_self_attn_local(*a, num_heads, valid_t, eps),
        (0, None, None, None, None, None, None, None), 0,
        x, ln_s, ln_b, wq, wk, wv, wo, bo)


def _vjp_fwd(x, ln_s, ln_b, wq, wk, wv, wo, bo, num_heads, valid_t, eps):
    out = _fwd(x, ln_s, ln_b, wq, wk, wv, wo, bo, num_heads, valid_t, eps)
    return out, (x, ln_s, ln_b, wq, wk, wv, wo, bo)


_PALLAS_BWD = True  # False -> XLA-recompute VJP (debug/fallback)


def _bwd_kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                gy_ref,
                dx_ref, dlns_ref, dlnb_ref, dwq_ref, dwk_ref, dwv_ref,
                dwo_ref, dbo_ref, *, eps: float, heads: int, d: int,
                scale: float, valid_t: int):
    """Forward recompute + full backward for one row-group. Padded query
    rows carry zero cotangent (the caller slices them off, so the slice VJP
    zero-fills) and padded key columns have p == 0, so no garbage from the
    sublane padding can reach any gradient."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    x0 = x_ref[...]               # (g, t, c)
    g, t, c = x0.shape
    cdt = x0.dtype
    x2 = x0.reshape(g * t, c)
    inner = wq_ref.shape[1]

    # ---- forward recompute (identical math to _kernel) ----
    xf = x2.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - mean * mean
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * r
    lns = lns_ref[...]
    xn = (xhat * lns + lnb_ref[...]).astype(cdt)

    def proj(w_ref):
        return jax.lax.dot_general(
            xn, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)

    q3 = proj(wq_ref).reshape(g, t, inner)
    k3 = proj(wk_ref).reshape(g, t, inner)
    v3 = proj(wv_ref).reshape(g, t, inner)

    mask = None
    if valid_t < t:
        col = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 2)
        mask = col >= valid_t

    gy = gy_ref[...].reshape(g * t, c).astype(jnp.float32)
    gyc = gy.astype(cdt)
    dbo_ref[...] += jnp.sum(gy, axis=0, keepdims=True)
    do3 = jax.lax.dot_general(            # gy @ Wo^T -> (g*t, inner)
        gyc, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(g, t, inner)

    o_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h in range(heads):
        hs = slice(h * d, (h + 1) * d)
        q_h, k_h, v_h = q3[..., hs], k3[..., hs], v3[..., hs]
        s = jax.lax.dot_general(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (g, t, t)
        if mask is not None:
            s = jnp.where(mask, -1e30, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pc = p.astype(cdt)
        o_parts.append(jax.lax.dot_general(
            pc, v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(cdt))

        do_h = do3[..., hs].astype(cdt)                 # (g, t, d)
        # dv_h = p^T @ do_h: contract the query axis
        dv_parts.append(jax.lax.dot_general(
            pc, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        # dp = do_h @ v_h^T
        dp = jax.lax.dot_general(
            do_h, v_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (g, t, t)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dsc = ds.astype(cdt)
        dq_parts.append(jax.lax.dot_general(             # ds @ k_h
            dsc, k_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        dk_parts.append(jax.lax.dot_general(             # ds^T @ q_h
            dsc, q_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))

    cat = lambda ps: (ps[0] if heads == 1 else jnp.concatenate(ps, axis=-1))
    o2 = cat(o_parts).reshape(g * t, inner)
    dwo_ref[...] += jax.lax.dot_general(  # o^T gy -> (inner, c)
        o2, gyc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dxn = jnp.zeros_like(xf)
    for dpart, w_ref, dw_ref in ((cat(dq_parts), wq_ref, dwq_ref),
                                 (cat(dk_parts), wk_ref, dwk_ref),
                                 (cat(dv_parts), wv_ref, dwv_ref)):
        d2 = dpart.reshape(g * t, inner).astype(cdt)
        dw_ref[...] += jax.lax.dot_general(   # xn^T d -> (c, inner)
            xn, d2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dxn = dxn + jax.lax.dot_general(      # d @ W^T -> (g*t, c)
            d2, w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dlns_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    dxhat = dxn * lns
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / c
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) / c
    dxf = r * (dxhat - m1 - xhat * m2)
    dx_ref[...] = (gy + dxf).astype(dx_ref.dtype).reshape(g, t, c)


def _bwd_group_rows(rows: int, t: int, c: int, inner: int) -> int:
    """Row-group size for the backward kernel: fp32 q/k/v grads + dxn
    dominate the per-group transients, so groups are smaller than the
    forward's (more live tensors per row). Power-of-2 divisor of rows."""
    per_g = t * (16 * inner + 16 * c) + 16 * t * t
    target = max((24 << 20) // max(per_g, 1), 1)
    g = 1
    cand = 1
    while cand <= target:
        if rows % cand == 0:
            g = cand
        cand *= 2
    return g


def _bwd_pallas(x, ln_s, ln_b, wq, wk, wv, wo, g_out, num_heads, valid_t, eps):
    rows, t, c = x.shape
    inner = wq.shape[1]
    d = inner // num_heads
    g = _bwd_group_rows(rows, t, c, inner)

    dt = x.dtype
    f32 = jnp.float32
    blk = pl.BlockSpec((g, t, c), lambda i: (i, 0, 0))
    wide = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    w_sd = jax.ShapeDtypeStruct((c, inner), f32)

    dx, dlns, dlnb, dwq, dwk, dwv, dwo, dbo = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, heads=num_heads, d=d,
                          scale=d ** -0.5, valid_t=valid_t),
        grid=(rows // g,),
        in_specs=[
            blk,
            wide((1, c)), wide((1, c)),
            wide((c, inner)), wide((c, inner)), wide((c, inner)),
            wide((inner, c)),
            blk,
        ],
        out_specs=[
            blk,
            wide((1, c)), wide((1, c)),
            wide((c, inner)), wide((c, inner)), wide((c, inner)),
            wide((inner, c)), wide((1, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, t, c), dt),
            jax.ShapeDtypeStruct((1, c), f32), jax.ShapeDtypeStruct((1, c), f32),
            w_sd, w_sd, w_sd,
            jax.ShapeDtypeStruct((inner, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # accumulators: sequential
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * rows * t * (8 * c * inner + 4 * t * inner),
            bytes_accessed=3 * rows * t * c * dt.itemsize,
            transcendentals=rows * num_heads * t * t,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x,
      ln_s.astype(f32).reshape(1, c), ln_b.astype(f32).reshape(1, c),
      wq.astype(dt), wk.astype(dt), wv.astype(dt), wo.astype(dt),
      g_out)
    return (dx, dlns.reshape(ln_s.shape).astype(ln_s.dtype),
            dlnb.reshape(ln_b.shape).astype(ln_b.dtype),
            dwq.astype(wq.dtype), dwk.astype(wk.dtype), dwv.astype(wv.dtype),
            dwo.astype(wo.dtype), dbo.reshape((c,)))


def _vjp_bwd(num_heads, valid_t, eps, residuals, g):
    x, ln_s, ln_b, wq, wk, wv, wo, bo = residuals
    if _PALLAS_BWD:
        out = _bwd_pallas(x, ln_s, ln_b, wq, wk, wv, wo, g, num_heads,
                          valid_t, eps)
        return (*out[:-1], out[-1].reshape(bo.shape).astype(bo.dtype))
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, num_heads=num_heads, valid_t=valid_t,
                                  eps=eps),
        x, ln_s, ln_b, wq, wk, wv, wo, bo)
    return vjp(g)


_fused_temporal_self_attn_local.defvjp(_vjp_fwd, _vjp_bwd)
