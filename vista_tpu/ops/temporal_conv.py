"""Frame-major temporal convolution (kernel size 3 over t), Pallas TPU kernel.

The VideoResBlock temporal branch convolves only the frame axis — the
reference runs ``torch.nn.Conv3d(kernel=(3,1,1))`` on ``(b, c, t, h, w)``
(reference vwm/modules/diffusionmodules/video_model.py VideoResBlock /
util.py AE3DConv). Expressed as an XLA 3-D convolution on the
``(b, t, h, w, c)`` view, the TPU layout assigner places the CFG batch
(b=2) on the sublane axis — a ``T(2,128)`` tiling that idles 3/4 of the
MXU's sublanes (measured 50 TF/s vs 136-170 TF/s for the spatial 1x1/3x3
convs, ~95ms/eval across the UNet at 576x1024).

Round-2 shipped a packed-matmul form (``z = x @ [W0|W1|W2]`` + row-shifted
masked adds). It fixed the MXU layout but its fp32 ``(bt, s, 3c)``
intermediate is a ~3.5 GB HBM round trip per ds1 site — profiled at
~95ms/eval of pure bandwidth across the UNet (temporal_conv.py:78/:84 in
tools/xprof.py) on top of the 73ms matmul.

This Pallas kernel keeps the whole tap accumulation in VMEM: the input is
zero-padded by one frame per video edge (``(b, t, s, c) -> (b, t+2, s, c)``,
which also compiles the video-boundary masking away entirely), and the
grid maps each output frame block to its three neighbor frames through
STATIC affine block index maps ``(ib, it+tap, is, 0)``. HBM traffic: 3
reads of x + 1 write of y — no intermediate. An earlier Pallas attempt
with *clamped dynamic* index maps (``jnp.maximum(i-1, 0)``) was ~15x
slower than XLA and wedged the device queue (see CLAUDE.md); static maps
on a padded input are the safe formulation.

Backward (custom_vjp — a raw pallas_call has no autodiff rule):
- dx is the SAME kernel with flipped transposed taps ``[W2^T|W1^T|W0^T]``
  applied to the padded cotangent (a 3-tap correlation is its own
  transpose), so the no-intermediate property holds in the backward too;
- dW contracts shifted x slices against the cotangent over all tokens —
  three plain XLA MXU matmuls (K = b*t*s is huge; nothing to fuse);
- db is a row reduction.
The packed-matmul form stays as the ``_PALLAS = False`` fallback for both
directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_VMEM_LIMIT = 100 * 1024 * 1024
# per-block VMEM budget for the s-axis tile: 3 input blocks (st, cin) bf16
# + 1 output block (st, cout) — x2 pipelining stays well under the limit
_S_TILE_BYTES = 12 << 20
_PALLAS = True
# A/B gate for the fused GN+SiLU prologue kernels (TemporalResBlock): when
# False the block runs the round-3 baseline path — XLA affine/SiLU
# elementwise + the plain temporal_conv3 kernel (bench.py --fused-gn off)
_FUSED_GN = True
# Off-TPU backends route the TemporalResBlock to the XLA compose fallback
# (interpret-mode Pallas is correct but very slow for CPU tests/CLIs);
# tests flip this to exercise the fused interpret-mode path explicitly.
_FUSED_GN_ON_CPU = False


def temporal_conv3_supported(s: int, c_in: int, c_out: int) -> bool:
    return s % 8 == 0 and c_in % 8 == 0 and c_out % 8 == 0


def _xla_reference(x: Array, w: Array, b: Array, num_frames: int) -> Array:
    """lax 3-tap conv over the frame axis on the (bt, s, c) packing."""
    bt, s, cin = x.shape
    cout = w.shape[-1]
    xv = x.reshape(bt // num_frames, num_frames, s, cin)
    dn = jax.lax.conv_dimension_numbers(
        xv.shape, (3, 1, cin, cout), ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xv, w.reshape(3, 1, cin, cout).astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (0, 0)),
        dimension_numbers=dn)
    return (y + b.astype(x.dtype)).reshape(bt, s, cout)


def _packed_matmul(x: Array, w: Array, b: Array, num_frames: int) -> Array:
    """Round-2 fallback: one (M, c) x (c, 3c) matmul + row-shifted adds.

    NOTE measured (bench.py A/B at 576x1024): keeping z in f32 is 0.6118
    f/s vs 0.5949 with a bf16 epilogue cast — the cast looks like a
    bandwidth win (halves the (bt,s,3c) intermediate) but breaks XLA's
    fusion of the shifted add into the matmul consumers.
    """
    bt, s, cin = x.shape
    cout = w.shape[-1]
    wcat = jnp.concatenate([w[0], w[1], w[2]], axis=-1).astype(x.dtype)
    z = jax.lax.dot_general(
        x.reshape(bt * s, cin), wcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, s, 3 * cout)
    z0, z1, z2 = z[..., :cout], z[..., cout:2 * cout], z[..., 2 * cout:]

    # out[i] takes z0 from the previous frame row and z2 from the next;
    # rows whose neighbor lies in a different video contribute zero (the
    # conv's SAME padding)
    zero = jnp.zeros_like(z0[:1])
    z0s = jnp.concatenate([zero, z0[:-1]], axis=0)
    z2s = jnp.concatenate([z2[1:], zero], axis=0)
    tidx = jnp.arange(bt) % num_frames
    m0 = (tidx > 0)[:, None, None]
    m2 = (tidx < num_frames - 1)[:, None, None]
    acc = z1 + jnp.where(m0, z0s, 0.0) + jnp.where(m2, z2s, 0.0)
    return acc.astype(x.dtype) + b.astype(x.dtype)


def _s_tile(s: int, cin: int, cout: int) -> int:
    """Largest sublane-aligned divisor of ``s`` within the VMEM budget."""
    cap = max(_S_TILE_BYTES // (6 * cin + 2 * cout), 8)
    if s <= cap:
        return s
    best = 8
    d = 8
    while d <= cap:
        if s % d == 0:
            best = d
        d += 8
    return best


def _conv3_kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, *, cin: int):
    x0 = x0_ref[0, 0]
    x1 = x1_ref[0, 0]
    x2 = x2_ref[0, 0]
    dot = lambda a, wt: jax.lax.dot_general(
        a, wt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc = dot(x0, w_ref[:cin])
    acc += dot(x1, w_ref[cin:2 * cin])
    acc += dot(x2, w_ref[2 * cin:])
    o_ref[0, 0] = (acc + b_ref[...]).astype(o_ref.dtype)


def _conv3_pallas(x: Array, w: Array, b: Array, num_frames: int) -> Array:
    bt, s, cin = x.shape
    cout = w.shape[-1]
    bsz = bt // num_frames
    # zero-pad one frame per video edge: SAME padding AND video-boundary
    # isolation come for free; XLA fuses the pad into the producer chain
    xp = jnp.pad(x.reshape(bsz, num_frames, s, cin),
                 ((0, 0), (1, 1), (0, 0), (0, 0)))

    st = _s_tile(s, cin, cout)
    grid = (bsz, num_frames, s // st)

    xspec = lambda tap: pl.BlockSpec(
        (1, 1, st, cin), lambda ib, it, si, tap=tap: (ib, it + tap, si, 0))
    wspec = pl.BlockSpec((3 * cin, cout), lambda ib, it, si: (0, 0))
    bspec = pl.BlockSpec((1, cout), lambda ib, it, si: (0, 0))

    out = pl.pallas_call(
        functools.partial(_conv3_kernel, cin=cin),
        grid=grid,
        in_specs=[xspec(0), xspec(1), xspec(2), wspec, bspec],
        out_specs=pl.BlockSpec(
            (1, 1, st, cout), lambda ib, it, si: (ib, it, si, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, num_frames, s, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bt * s * cin * cout,
            bytes_accessed=(3 * bt * s * cin + bt * s * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xp, xp, xp, w.reshape(3 * cin, cout).astype(x.dtype),
      b.astype(jnp.float32).reshape(1, cout))
    return out.reshape(bt, s, cout)


def _fwd_impl(x: Array, w: Array, b: Array, num_frames: int) -> Array:
    if _PALLAS:
        return _conv3_pallas(x, w, b, num_frames)
    return _packed_matmul(x, w, b, num_frames)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _temporal_conv3_local(x: Array, w: Array, b: Array, num_frames: int) -> Array:
    return _fwd_impl(x, w, b, num_frames)


def _shard_dim(bt: int, s: int, num_frames: int):
    """Shardable dim of a frame-major ``(bt, s, c)`` kernel input under the
    active kernel-sharding context. The frame axis carries a 3-tap halo, so
    dim 0 is only safe when each shard gets WHOLE videos (contiguous equal
    chunks of ``bt = b*t`` rows align with video boundaries iff the video
    count divides the group). Otherwise the token dim ``s`` is a pure batch
    dim — shard it when the local slice stays sublane-aligned. None = leave
    the call to GSPMD."""
    from vista_tpu.parallel.kernel_sharding import group_size

    g = group_size()
    if g == 1:
        return None
    if bt % num_frames == 0 and (bt // num_frames) % g == 0:
        return 0
    if s % g == 0 and (s // g) % 8 == 0:
        return 1
    return None


def temporal_conv3(x: Array, w: Array, b: Array, num_frames: int) -> Array:
    """SAME 3-tap convolution over the frame axis of frame-major ``x``.

    x: ``(b*num_frames, s, c_in)`` with frames of each video contiguous.
    w: ``(3, c_in, c_out)`` taps (t-1, t, t+1). b: ``(c_out,)``.

    Under ``parallel.kernel_sharding`` this runs as a shard_map island over
    whole videos (dim 0) or over the token dim (dim 1) — see ``_shard_dim``.
    """
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    dim = _shard_dim(x.shape[0], x.shape[1], num_frames)
    return shard_kernel(
        lambda x, w, b: _temporal_conv3_local(x, w, b, num_frames),
        (dim, None, None), dim, x, w, b)


def _vjp_fwd(x, w, b, num_frames):
    return _fwd_impl(x, w, b, num_frames), (x, w)


def _vjp_bwd(num_frames, residuals, gy):
    x, w = residuals
    bt, s, cin = x.shape
    cout = w.shape[-1]
    bsz = bt // num_frames
    gyc = gy.astype(x.dtype)

    # dx: 3-tap correlation of gy with flipped transposed taps — the same
    # conv kernel (and the same _PALLAS gate) with w' = [W2^T | W1^T | W0^T]
    wt = jnp.stack([jnp.transpose(w[2]), jnp.transpose(w[1]),
                    jnp.transpose(w[0])])
    dx = _fwd_impl(gyc, wt, jnp.zeros((cin,), jnp.float32), num_frames)

    # dW[tap] = sum_j x[j+tap-1]^T gy[j]: shifted-slice MXU contractions
    # over all tokens, fp32 accumulation (operand dtypes match the fwd)
    xv = x.reshape(bsz, num_frames, s, cin)
    gv = gyc.reshape(bsz, num_frames, s, cout)
    flat = lambda a: a.reshape(-1, a.shape[-1])
    dotT = lambda a, g: jax.lax.dot_general(
        flat(a), flat(g), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = jnp.stack([
        dotT(xv[:, :-1], gv[:, 1:]),
        dotT(xv, gv),
        dotT(xv[:, 1:], gv[:, :-1]),
    ]).astype(w.dtype)
    db = jnp.sum(gy.astype(jnp.float32), axis=(0, 1))
    return dx.astype(x.dtype), dw, db


_temporal_conv3_local.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Fused GroupNorm+SiLU prologue / emb / residual+blend epilogue variants
# --------------------------------------------------------------------------
#
# The TemporalResBlock chain is GN -> SiLU -> conv3 (+emb) -> GN -> SiLU ->
# conv3 -> +x -> AlphaBlender (reference video_model.py:9-75 + the learned
# blend). Each arrow that leaves the conv is an extra HBM pass over a
# (bt, s, c) tensor. These two ops fold the whole chain around each conv
# into the kernel: the caller reduces the GroupNorm statistics in XLA
# (a single read of x — the same read the standalone GN does) and folds
# them into per-frame-channel affine ``scale``/``shift``; the kernel
# normalizes + SiLUs each tap block in VMEM and applies the epilogue
# (per-frame emb bias for in_conv; ``residual + res_scale * y`` for
# out_conv, which is the algebraic form of ``x + h`` followed by
# ``a*x + (1-a)*(x+h)``). The zero-padded edge frames stay exact: scale
# and shift are zero-padded too, so the affine maps padding to 0 and
# silu(0) = 0.
#
# Backward: jax.vjp of the XLA-recomputed affine+SiLU composed with
# ``temporal_conv3`` — the conv's own (Pallas) custom VJP does the heavy
# lifting; the elementwise prologue/epilogue VJPs are cheap XLA fusions.


def _silu_f32(a):
    # tanh-form sigmoid: Mosaic-safe (no erf/logistic primitive needed)
    return a * 0.5 * (1.0 + jnp.tanh(0.5 * a))


def _gn_conv3_kernel(x0_ref, x1_ref, x2_ref, s0_ref, s1_ref, s2_ref,
                     h0_ref, h1_ref, h2_ref, w_ref, b_ref, *rest,
                     cin: int, has_emb: bool, has_res: bool):
    o_ref = rest[-1]
    dot = lambda a, wt: jax.lax.dot_general(
        a, wt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def tap(x_ref, s_ref, h_ref):
        a = (x_ref[0, 0].astype(jnp.float32) * s_ref[0, 0] + h_ref[0, 0])
        return _silu_f32(a).astype(o_ref.dtype)

    acc = dot(tap(x0_ref, s0_ref, h0_ref), w_ref[:cin])
    acc += dot(tap(x1_ref, s1_ref, h1_ref), w_ref[cin:2 * cin])
    acc += dot(tap(x2_ref, s2_ref, h2_ref), w_ref[2 * cin:])
    acc += b_ref[...]
    i = 0
    if has_emb:
        acc += rest[i][0, 0]
        i += 1
    if has_res:
        res_ref, rs_ref = rest[i], rest[i + 1]
        acc = res_ref[0, 0].astype(jnp.float32) + rs_ref[0, 0] * acc
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _gn_conv3_pallas(x, scale, shift, w, b, num_frames, emb, residual,
                     res_scale):
    bt, s, cin = x.shape
    cout = w.shape[-1]
    bsz = bt // num_frames
    xp = jnp.pad(x.reshape(bsz, num_frames, s, cin),
                 ((0, 0), (1, 1), (0, 0), (0, 0)))
    # zero-padded affine: padded frames normalize to 0 and silu(0) = 0,
    # so the edge taps contribute nothing (the conv's SAME padding)
    pad_fc = lambda a: jnp.pad(
        a.astype(jnp.float32).reshape(bsz, num_frames, 1, a.shape[-1]),
        ((0, 0), (1, 1), (0, 0), (0, 0)))
    sp, hp = pad_fc(scale), pad_fc(shift)

    st = _s_tile(s, cin, cout)
    grid = (bsz, num_frames, s // st)

    xspec = lambda tap: pl.BlockSpec(
        (1, 1, st, cin), lambda ib, it, si, tap=tap: (ib, it + tap, si, 0))
    fcspec = lambda tap: pl.BlockSpec(
        (1, 1, 1, cin), lambda ib, it, si, tap=tap: (ib, it + tap, 0, 0))
    wspec = pl.BlockSpec((3 * cin, cout), lambda ib, it, si: (0, 0))
    bspec = pl.BlockSpec((1, cout), lambda ib, it, si: (0, 0))

    in_specs = [xspec(0), xspec(1), xspec(2),
                fcspec(0), fcspec(1), fcspec(2),
                fcspec(0), fcspec(1), fcspec(2), wspec, bspec]
    operands = [xp, xp, xp, sp, sp, sp, hp, hp, hp,
                w.reshape(3 * cin, cout).astype(x.dtype),
                b.astype(jnp.float32).reshape(1, cout)]
    if emb is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, cout), lambda ib, it, si: (ib, it, 0, 0)))
        operands.append(
            emb.astype(jnp.float32).reshape(bsz, num_frames, 1, cout))
    if residual is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, st, cout), lambda ib, it, si: (ib, it, si, 0)))
        operands.append(residual.reshape(bsz, num_frames, s, cout))
        in_specs.append(pl.BlockSpec((1, 1), lambda ib, it, si: (0, 0)))
        operands.append(res_scale.astype(jnp.float32).reshape(1, 1))

    out = pl.pallas_call(
        functools.partial(_gn_conv3_kernel, cin=cin,
                          has_emb=emb is not None,
                          has_res=residual is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, st, cout), lambda ib, it, si: (ib, it, si, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, num_frames, s, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bt * s * cin * cout + 12 * bt * s * cin,
            bytes_accessed=(3 * bt * s * cin
                            + (1 + (residual is not None)) * bt * s * cout
                            ) * x.dtype.itemsize,
            transcendentals=3 * bt * s * cin,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)
    return out.reshape(bt, s, cout)


def _gn_conv3_compose(x, scale, shift, w, b, num_frames, emb, residual,
                      res_scale):
    """XLA reference composition (backward recompute + fallback path)."""
    a = x.astype(jnp.float32) * scale.astype(jnp.float32)[:, None, :] \
        + shift.astype(jnp.float32)[:, None, :]
    xn = _silu_f32(a).astype(x.dtype)
    # NOTE: the _local entry, not the sharding-aware wrapper — this runs
    # inside custom_vjp backward functions, which trace OUTSIDE the island
    # body's suspended context (nesting a shard_map there would be invalid).
    y = _temporal_conv3_local(xn, w, b, num_frames).astype(jnp.float32)
    if emb is not None:
        y = y + emb.astype(jnp.float32)[:, None, :]
    if residual is not None:
        y = residual.astype(jnp.float32) + res_scale.astype(jnp.float32) * y
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_gn_silu_conv3_emb_local(x, scale, shift, w, b, emb, num_frames):
    if _PALLAS:
        return _gn_conv3_pallas(x, scale, shift, w, b, num_frames, emb,
                                None, None)
    return _gn_conv3_compose(x, scale, shift, w, b, num_frames, emb,
                             None, None)


def fused_gn_silu_conv3_emb(x, scale, shift, w, b, emb, num_frames):
    """``conv3(silu(x*scale + shift)) + b + emb`` in one VMEM pass.

    x: (bt, s, cin); scale/shift: (bt, cin) per-frame-channel GroupNorm
    affine (stats folded by the caller); emb: (bt, cout) per-frame bias.

    Under ``parallel.kernel_sharding``: shard_map island over whole videos
    (dim 0, affine/emb sharded along) or the token dim (dim 1, affine/emb
    replicated) — see ``_shard_dim``.
    """
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    dim = _shard_dim(x.shape[0], x.shape[1], num_frames)
    row = dim if dim == 0 else None  # (bt, c) operands follow dim-0 shards
    return shard_kernel(
        lambda x, sc, sh, w, b, e: _fused_gn_silu_conv3_emb_local(
            x, sc, sh, w, b, e, num_frames),
        (dim, row, row, None, None, row), dim,
        x, scale, shift, w, b, emb)


def _emb_vjp_fwd(x, scale, shift, w, b, emb, num_frames):
    return (_fused_gn_silu_conv3_emb_local(x, scale, shift, w, b, emb, num_frames),
            (x, scale, shift, w, b, emb))


def _emb_vjp_bwd(num_frames, res, gy):
    x, scale, shift, w, b, emb = res
    f = lambda *a: _gn_conv3_compose(*a, num_frames, emb=None, residual=None,
                                     res_scale=None)
    _, vjp = jax.vjp(f, x, scale, shift, w, b)
    dx, dscale, dshift, dw, db = vjp(gy.astype(x.dtype))
    demb = jnp.sum(gy.astype(jnp.float32), axis=1).astype(emb.dtype)
    return dx, dscale, dshift, dw, db, demb


_fused_gn_silu_conv3_emb_local.defvjp(_emb_vjp_fwd, _emb_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_gn_silu_conv3_res_local(x, scale, shift, w, b, residual, res_scale,
                                   num_frames):
    if _PALLAS:
        return _gn_conv3_pallas(x, scale, shift, w, b, num_frames, None,
                                residual, res_scale)
    return _gn_conv3_compose(x, scale, shift, w, b, num_frames, None,
                             residual, res_scale)


def fused_gn_silu_conv3_res(x, scale, shift, w, b, residual, res_scale,
                            num_frames):
    """``residual + res_scale * (conv3(silu(x*scale + shift)) + b)``.

    The epilogue is the algebraic collapse of the temporal residual add
    followed by the AlphaBlender: ``a*xs + (1-a)*(xs + h) = xs + (1-a)*h``
    with ``residual = xs`` and ``res_scale = 1 - a``.

    Sharding: as ``fused_gn_silu_conv3_emb`` (res_scale is a replicated
    scalar whose cotangent psums across shards).
    """
    from vista_tpu.parallel.kernel_sharding import shard_kernel

    dim = _shard_dim(x.shape[0], x.shape[1], num_frames)
    row = dim if dim == 0 else None
    return shard_kernel(
        lambda x, sc, sh, w, b, r, rs: _fused_gn_silu_conv3_res_local(
            x, sc, sh, w, b, r, rs, num_frames),
        (dim, row, row, None, None, dim, None), dim,
        x, scale, shift, w, b, residual, res_scale)


def _res_vjp_fwd(x, scale, shift, w, b, residual, res_scale, num_frames):
    out = _fused_gn_silu_conv3_res_local(x, scale, shift, w, b, residual,
                                         res_scale, num_frames)
    return out, (x, scale, shift, w, b, res_scale)


def _res_vjp_bwd(num_frames, res, gy):
    x, scale, shift, w, b, res_scale = res
    gf = gy.astype(jnp.float32)
    f = lambda *a: _gn_conv3_compose(*a, num_frames, emb=None, residual=None,
                                     res_scale=None)
    y, vjp = jax.vjp(f, x, scale, shift, w, b)
    dx, dscale, dshift, dw, db = vjp((res_scale.astype(jnp.float32)
                                      * gf).astype(x.dtype))
    dres = gy.astype(x.dtype)
    drs = jnp.sum(gf * y.astype(jnp.float32)).astype(res_scale.dtype)
    return dx, dscale, dshift, dw, db, dres, drs


_fused_gn_silu_conv3_res_local.defvjp(_res_vjp_fwd, _res_vjp_bwd)
