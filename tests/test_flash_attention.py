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
        # crossover at 2048 tokens (XLA fused attention wins below); covers
        # the 9216- and 2304-token spatial shapes of 576x1024
        assert flash_shape_supported((2, 9216, 5, 64), (2, 9216, 5, 64))
        assert flash_shape_supported((2, 2304, 10, 64), (2, 2304, 10, 64))
        assert not flash_shape_supported((2, 576, 20, 64), (2, 576, 20, 64))
        assert not flash_shape_supported((2, 25, 5, 64), (2, 25, 5, 64))


class TestFlashBackward:
    """Blockwise Pallas VJP vs XLA autodiff grads (interpret mode on CPU)."""

    def _check_grads(self, b, s_q, s_k, h, d, seed=0):
        from vista_tpu.ops.flash_attention import flash_attention

        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(b, s_q, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, s_k, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, s_k, h, d), jnp.float32)
        ct = jnp.asarray(rng.randn(b, s_q, h, d), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v) * ct)

        def loss_ref(q, k, v):
            return jnp.sum(_xla_reference(q, k, v) * ct)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=3e-4,
                err_msg=f"d{name} mismatch")

    def test_grads_block_aligned(self):
        self._check_grads(b=1, s_q=256, s_k=256, h=2, d=16)

    def test_grads_multi_kv_blocks(self):
        self._check_grads(b=1, s_q=128, s_k=384, h=1, d=16)

    def test_grads_ragged(self):
        # both seq dims ragged: padded-row/column handling in the VJP
        self._check_grads(b=1, s_q=150, s_k=200, h=1, d=16)

    def test_lse_matches_reference(self):
        from vista_tpu.ops.flash_attention import _flash_fwd_packed

        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(2, 128, 16), jnp.float32)
        k = jnp.asarray(rng.randn(2, 200, 16), jnp.float32)
        v = jnp.asarray(rng.randn(2, 200, 16), jnp.float32)
        _, lse = _flash_fwd_packed(q, k, v, num_heads=1, interpret=True)
        logits = jnp.einsum("bqd,bkd->bqk", q, k) * (16 ** -0.5)
        ref = jax.scipy.special.logsumexp(logits, axis=-1)
        np.testing.assert_allclose(np.asarray(lse[:, 0, :, 0]), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
