"""Tiny-shape TPU validation of the fused GN+SiLU+conv3 kernels.

Compares the Pallas fused forward (``fused_gn_silu_conv3_{emb,res}``) and
its custom-VJP gradients against the all-XLA composition (``_PALLAS=False``
packed-matmul conv + elementwise affine/SiLU) on the real chip, at tiny
shapes under a hard external ``timeout`` — a pathologically slow kernel
must never reach a full-shape dispatch (see CLAUDE.md "Environment
gotchas": a wedged execute queue takes ~75 min to drain).

Run BEFORE any full-shape bench whenever these kernels change:

    timeout 580 python tools/fused_gn_check_tpu.py

Reference workload: the TemporalResBlock chain,
vwm/modules/diffusionmodules/video_model.py (VideoResBlock time_stack).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import vista_tpu.ops.temporal_conv as tc
from vista_tpu.ops.temporal_conv import (
    _gn_conv3_compose,
    fused_gn_silu_conv3_emb,
    fused_gn_silu_conv3_res,
)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    bsz, t, s, c = 2, 8, 64, 128
    bt = bsz * t
    x = jnp.asarray(rng.randn(bt, s, c), jnp.bfloat16)
    sc = jnp.asarray(rng.rand(bt, c) + 0.5, jnp.float32)
    sh = jnp.asarray(rng.randn(bt, c) * 0.1, jnp.float32)
    w = jnp.asarray(rng.randn(3, c, c) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
    emb = jnp.asarray(rng.randn(bt, c), jnp.float32)
    res = jnp.asarray(rng.randn(bt, s, c), jnp.bfloat16)
    rs = jnp.asarray(0.7, jnp.float32)

    # XLA reference: compose path with the packed-matmul conv
    def xla_emb(*a):
        old = tc._PALLAS
        tc._PALLAS = False
        try:
            return _gn_conv3_compose(*a, t, emb=emb, residual=None,
                                     res_scale=None)
        finally:
            tc._PALLAS = old

    def xla_res(*a):
        old = tc._PALLAS
        tc._PALLAS = False
        try:
            return _gn_conv3_compose(*a, t, emb=None, residual=res,
                                     res_scale=rs)
        finally:
            tc._PALLAS = old

    f_emb = jax.jit(lambda *a: fused_gn_silu_conv3_emb(*a, emb, t))
    f_res = jax.jit(lambda *a: fused_gn_silu_conv3_res(*a, res, rs, t))
    r_emb = jax.jit(xla_emb)
    r_res = jax.jit(xla_res)

    args = (x, sc, sh, w, b)
    d1 = rel(f_emb(*args), r_emb(*args))
    d2 = rel(f_res(*args), r_res(*args))
    print(f"fwd emb: {d1:.2e}  fwd res: {d2:.2e}")
    assert d1 < 2e-2 and d2 < 2e-2, "fused GN forward disagrees with XLA"

    le = jax.jit(jax.grad(lambda *a: jnp.sum(f_emb(*a) ** 2).astype(jnp.float32),
                          argnums=(0, 1, 2, 3, 4)))
    lr_ = jax.jit(jax.grad(lambda *a: jnp.sum(r_emb(*a) ** 2).astype(jnp.float32),
                           argnums=(0, 1, 2, 3, 4)))
    for name, ga, gb in zip("x sc sh w b".split(), le(*args), lr_(*args)):
        d = rel(ga, gb)
        print(f"grad[emb] {name}: {d:.2e}")
        assert d < 2e-2, f"grad {name} disagrees"

    ls = jax.jit(jax.grad(lambda *a: jnp.sum(f_res(*a) ** 2).astype(jnp.float32),
                          argnums=(0, 1, 2, 3, 4)))
    ls_r = jax.jit(jax.grad(lambda *a: jnp.sum(r_res(*a) ** 2).astype(jnp.float32),
                            argnums=(0, 1, 2, 3, 4)))
    for name, ga, gb in zip("x sc sh w b".split(), ls(*args), ls_r(*args)):
        d = rel(ga, gb)
        print(f"grad[res] {name}: {d:.2e}")
        assert d < 2e-2, f"grad {name} disagrees"

    print("OK: fused GN+SiLU+conv3 kernels match XLA on", jax.default_backend())


if __name__ == "__main__":
    main()
