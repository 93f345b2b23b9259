"""Numerical parity of the Pallas flash kernel vs the XLA reference path.

Runs in Pallas interpreter mode on CPU (small shapes only — interpret mode is
slow); the compiled path is exercised on real TPU by bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vista_tpu.ops.flash_attention import _flash_forward, _xla_reference, flash_shape_supported


class TestFlashAttention:
    def _check(self, b, s_q, s_k, h, d, seed=0):
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(b, s_q, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, s_k, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, s_k, h, d), jnp.float32)
        out = _flash_forward(q, k, v, interpret=True)
        ref = _xla_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_block_aligned(self):
        self._check(b=2, s_q=256, s_k=256, h=2, d=16)

    def test_ragged_kv(self):
        # 200 % 128 != 0: exercises the -inf tail masking
        self._check(b=1, s_q=128, s_k=200, h=1, d=16)

    def test_ragged_q(self):
        self._check(b=1, s_q=150, s_k=128, h=1, d=16)

    def test_multi_kv_blocks(self):
        # several sequential kv blocks -> online-softmax recurrence exercised
        self._check(b=1, s_q=128, s_k=384, h=1, d=16)

    def test_shape_gate(self):
        # crossover measured at ~4096 tokens (XLA fused attention wins below)
        assert flash_shape_supported((2, 9216, 5, 64), (2, 9216, 5, 64))
        assert not flash_shape_supported((2, 2880, 5, 64), (2, 2880, 5, 64))
        assert not flash_shape_supported((2, 25, 5, 64), (2, 25, 5, 64))
