"""Tiny-shape TPU validation of the fused-FF strip-pipelined path.

Per CLAUDE.md discipline: every not-yet-TPU-executed Pallas kernel variant
must run on TINY shapes under a hard timeout before any full-shape dispatch
(a pathological kernel wedges the device execute queue for ~an hour).

Run:  timeout 300 python tools/ff_strips_check.py
Compares VISTA_FF_STRIPS=N against the composed XLA reference at every UNet
width on the real TPU. Exits nonzero on mismatch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIPS = int(os.environ.get("VISTA_FF_STRIPS", "2"))
os.environ["VISTA_FF_STRIPS"] = str(STRIPS)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vista_tpu.ops import fused_ff

    assert fused_ff._FF_STRIPS == STRIPS
    print(f"backend={jax.default_backend()} strips={STRIPS}", flush=True)
    ok = True
    for c in (320, 640, 1280):
        inner = 4 * c
        rng = np.random.RandomState(c)
        n = 256
        x = jnp.asarray(rng.randn(n, c) * 0.5, jnp.bfloat16)
        ln_s = jnp.asarray(rng.randn(c) * 0.1 + 1.0, jnp.float32)
        ln_b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.randn(c, 2 * inner) / np.sqrt(c), jnp.float32)
        b1 = jnp.asarray(rng.randn(2 * inner) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.randn(inner, c) / np.sqrt(inner), jnp.float32)
        b2 = jnp.asarray(rng.randn(c) * 0.02, jnp.float32)

        got = jax.block_until_ready(jax.jit(fused_ff.fused_geglu_ff)(
            x, ln_s, ln_b, w1, b1, w2, b2))
        want = jax.block_until_ready(jax.jit(fused_ff._xla_reference)(
            x, ln_s, ln_b, w1, b1, w2, b2))
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
        rel = err / scale
        print(f"c={c}: strips={fused_ff._n_strips(inner)} max_err={err:.3e} rel={rel:.3e}",
              flush=True)
        ok &= rel < 3e-2  # bf16 matmul reorder noise
    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
