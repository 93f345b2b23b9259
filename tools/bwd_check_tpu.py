"""Tiny-shape TPU validation of the Pallas backward kernels (five paths:
fused FF narrow + wide/chunked, fused QKV, fused temporal attn, tiny attn).

Runs grads through each fused op twice — Pallas backward vs the
XLA-recompute fallback (flipped via each module's monkeypatch gate) —
on the real chip and compares. Tiny shapes + a hard external `timeout`
keep a bad kernel from wedging the device execute queue (see CLAUDE.md
"Environment gotchas"); Mosaic compile failures surface here at compile
time, before any full-shape train_bench dispatch.

Run BEFORE any full-shape training dispatch whenever a backward kernel
changes:  timeout 580 python tools/bwd_check_tpu.py

Threshold note: the comparison is Pallas-bwd vs XLA-recompute, BOTH in
bf16 compute, so ~5e-3 max-normalized disagreement is bf16 ordering
noise, not error (interpret-mode tests pin exactness to 2e-5 vs fp32
autodiff). Measured on v5e: ff 4.3e-3, qkv 4.8e-3, temporal 5.5e-3,
tiny 1.5e-4.

Reference workload: vwm/modules/attention.py:384-399 (training
backward through the attention stack).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import vista_tpu.ops.fused_ff as ff_mod
import vista_tpu.ops.fused_qkv as qkv_mod
import vista_tpu.ops.fused_temporal_attn as ta_mod
import vista_tpu.ops.tiny_attention as tiny_mod
from vista_tpu.ops.fused_ff import fused_geglu_ff
from vista_tpu.ops.fused_qkv import fused_ln_qkv
from vista_tpu.ops.fused_temporal_attn import fused_temporal_self_attn
from vista_tpu.ops.tiny_attention import tiny_attention_packed

TOL = 1e-2


def compare(name, loss_fn, args, gate_on, gate_off, n_args):
    # Gates are read at trace time; fresh lambdas per call avoid jit-cache
    # collisions between the two configurations.
    gate_off()
    g_ref = jax.jit(jax.grad(lambda *a: loss_fn(*a),
                             argnums=tuple(range(n_args))))(*args)
    g_ref = jax.tree.map(lambda x: np.asarray(x, np.float32), g_ref)
    gate_on()
    g_pal = jax.jit(jax.grad(lambda *a: loss_fn(*a) * 1.0,
                             argnums=tuple(range(n_args))))(*args)
    g_pal = jax.tree.map(lambda x: np.asarray(x, np.float32), g_pal)
    worst = 0.0
    for a, b in zip(g_ref, g_pal):
        scale = max(1e-3, float(np.abs(a).max()))
        worst = max(worst, float(np.abs(a - b).max()) / scale)
    print(f"{name}: worst rel err {worst:.2e}",
          "OK" if worst < TOL else "FAIL", flush=True)
    return worst < TOL


def main():
    print("devices:", jax.devices(), flush=True)
    ok = True
    rng = np.random.RandomState(0)

    # ---- fused FF (c=320, small token count) ----
    c, inner = 320, 1280
    x = jnp.asarray(rng.randn(512, c), jnp.bfloat16)
    ln_s = jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32)
    ln_b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 2 * inner) * (c ** -0.5), jnp.float32)
    b1 = jnp.asarray(rng.randn(2 * inner) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(inner, c) * (inner ** -0.5), jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
    ct = jnp.asarray(rng.randn(512, c), jnp.float32)
    ff_max = ff_mod.MAX_FUSED_BWD_DIM
    ok &= compare(
        "fused_ff c=320",
        lambda *a: jnp.sum(fused_geglu_ff(*a) * ct),
        (x, ln_s, ln_b, w1, b1, w2, b2),
        lambda: (setattr(ff_mod, "MAX_FUSED_BWD_DIM", ff_max),
                 setattr(ff_mod, "_WIDE_PALLAS_BWD", True)),
        # gate BOTH Pallas paths off: MAX_FUSED_BWD_DIM=0 alone would route
        # c=320 into the WIDE Pallas kernel, comparing Pallas vs Pallas
        lambda: (setattr(ff_mod, "MAX_FUSED_BWD_DIM", 0),
                 setattr(ff_mod, "_WIDE_PALLAS_BWD", False)),
        7,
    )

    # ---- fused FF wide backward (c=1280 > MAX_FUSED_BWD_DIM: the
    # activation-export kernel + XLA dW matmuls; second case monkeypatches
    # the chunk cap down to force the multi-chunk lax.scan path) ----
    cw, innerw = 1280, 5120
    xw = jnp.asarray(rng.randn(256, cw), jnp.bfloat16)
    lnw_s = jnp.asarray(rng.randn(cw) * 0.2 + 1, jnp.float32)
    lnw_b = jnp.asarray(rng.randn(cw) * 0.1, jnp.float32)
    w1w = jnp.asarray(rng.randn(cw, 2 * innerw) * (cw ** -0.5), jnp.float32)
    b1w = jnp.asarray(rng.randn(2 * innerw) * 0.05, jnp.float32)
    w2w = jnp.asarray(rng.randn(innerw, cw) * (innerw ** -0.5), jnp.float32)
    b2w = jnp.asarray(rng.randn(cw) * 0.05, jnp.float32)
    ctw = jnp.asarray(rng.randn(256, cw), jnp.float32)
    wide_args = (xw, lnw_s, lnw_b, w1w, b1w, w2w, b2w)
    wide_loss = lambda *a: jnp.sum(fused_geglu_ff(*a) * ctw)
    ok &= compare(
        "fused_ff wide c=1280",
        wide_loss, wide_args,
        lambda: setattr(ff_mod, "_WIDE_PALLAS_BWD", True),
        lambda: setattr(ff_mod, "_WIDE_PALLAS_BWD", False),
        7,
    )
    chunk_cap = ff_mod._WIDE_CHUNK_BYTES
    ok &= compare(
        "fused_ff wide c=1280 (chunked scan)",
        lambda *a: wide_loss(*a) + 0.0, wide_args,
        lambda: (setattr(ff_mod, "_WIDE_PALLAS_BWD", True),
                 # 64 rows/chunk at 2*inner bf16 -> 4 scan chunks over 256 rows
                 setattr(ff_mod, "_WIDE_CHUNK_BYTES",
                         64 * 2 * innerw * 2)),
        lambda: (setattr(ff_mod, "_WIDE_PALLAS_BWD", False),
                 setattr(ff_mod, "_WIDE_CHUNK_BYTES", chunk_cap)),
        7,
    )
    ff_mod._WIDE_CHUNK_BYTES = chunk_cap
    ff_mod._WIDE_PALLAS_BWD = True

    # ---- fused QKV (c=320) ----
    x = jnp.asarray(rng.randn(512, c), jnp.bfloat16)
    ws = [jnp.asarray(rng.randn(c, c) * (c ** -0.5), jnp.float32)
          for _ in range(3)]
    ctq = jnp.asarray(rng.randn(512, c), jnp.float32)

    def qkv_loss(x, s, b, wq, wk, wv):
        q, k, v = fused_ln_qkv(x, s, b, wq, wk, wv)
        return (jnp.sum(q * ctq) + jnp.sum(k * ctq) * 0.5
                + jnp.sum(v * ctq) * 0.25)

    qkv_max = qkv_mod.MAX_FUSED_BWD_DIM
    ok &= compare(
        "fused_qkv c=320",
        qkv_loss,
        (x, ln_s, ln_b, *ws),
        lambda: setattr(qkv_mod, "MAX_FUSED_BWD_DIM", qkv_max),
        lambda: setattr(qkv_mod, "MAX_FUSED_BWD_DIM", 0),
        6,
    )

    # ---- fused temporal self-attn (t padded 25->32, like the model) ----
    t, valid_t, heads = 32, 25, 5
    x = jnp.asarray(rng.randn(64, t, c), jnp.bfloat16)
    wq, wk, wv = (jnp.asarray(rng.randn(c, c) * (c ** -0.5), jnp.float32)
                  for _ in range(3))
    wo = jnp.asarray(rng.randn(c, c) * (c ** -0.5), jnp.float32)
    bo = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
    ctt_np = rng.randn(64, t, c)
    ctt_np[:, valid_t:, :] = 0.0  # padded frames carry zero cotangent
    ctt = jnp.asarray(ctt_np, jnp.float32)
    ok &= compare(
        "fused_temporal_attn",
        lambda *a: jnp.sum(fused_temporal_self_attn(*a, heads, valid_t) * ctt),
        (x, ln_s, ln_b, wq, wk, wv, wo, bo),
        lambda: setattr(ta_mod, "_PALLAS_BWD", True),
        lambda: setattr(ta_mod, "_PALLAS_BWD", False),
        8,
    )

    # ---- tiny attention (t=25, unaligned — the kernel handles raw t) ----
    q = jnp.asarray(rng.randn(64, 25, 32), jnp.float32)
    k = jnp.asarray(rng.randn(64, 25, 32), jnp.float32)
    v = jnp.asarray(rng.randn(64, 25, 32), jnp.float32)
    cta = jnp.asarray(rng.randn(64, 25, 32), jnp.float32)
    ok &= compare(
        "tiny_attention",
        lambda *a: jnp.sum(tiny_attention_packed(*a, 2) * cta),
        (q, k, v),
        lambda: setattr(tiny_mod, "_PALLAS_BWD", True),
        lambda: setattr(tiny_mod, "_PALLAS_BWD", False),
        3,
    )

    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
