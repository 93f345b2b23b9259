"""Parity of the fused tiny-seq (temporal t=25) attention kernel.

Interpreter mode on CPU; the compiled path is exercised on TPU by bench.py.
Reference workload: vwm/modules/video_attention.py:116 (attention over the
frame axis per spatial location).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vista_tpu.ops.attention import attention_packed
from vista_tpu.ops.tiny_attention import (
    _xla_packed_reference,
    tiny_attention_packed,
    tiny_shape_supported,
)


class TestTinyAttention:
    def _check(self, rows, t, h, d, seed=0):
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(rows, t, h * d), jnp.float32)
        k = jnp.asarray(rng.randn(rows, t, h * d), jnp.float32)
        v = jnp.asarray(rng.randn(rows, t, h * d), jnp.float32)
        out = tiny_attention_packed(q, k, v, h)
        ref = _xla_packed_reference(q, k, v, h)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_vista_temporal_shape(self):
        # 25 frames, multiple heads, rows not a power of two
        self._check(rows=24, t=25, h=2, d=16)

    def test_single_head(self):
        self._check(rows=16, t=8, h=1, d=32)

    def test_odd_rows(self):
        # rows with no large power-of-two divisor -> small group fallback
        self._check(rows=9, t=25, h=2, d=16)

    def test_gate(self):
        assert tiny_shape_supported(25, 25)
        assert not tiny_shape_supported(25, 1)   # cross-attn, unequal seq
        assert not tiny_shape_supported(2304, 2304)
        # mid-resolution spatial shapes routed to this kernel
        assert tiny_shape_supported(576, 576, num_heads=20)  # ds4 @ 576x1024
        assert tiny_shape_supported(720, 720, num_heads=10)  # ds2 @ 320x576
        # logit transients of all unrolled heads must fit the VMEM stack
        assert not tiny_shape_supported(1024, 1024, num_heads=20)

    def test_ds2_spatial_shape(self):
        # the 320x576 ds2 spatial attention (s=720, lane-unaligned logits)
        self._check(rows=2, t=720, h=2, d=16)

    def test_grads_match_reference(self):
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(8, 25, 32), jnp.float32)
        k = jnp.asarray(rng.randn(8, 25, 32), jnp.float32)
        v = jnp.asarray(rng.randn(8, 25, 32), jnp.float32)
        ct = jnp.asarray(rng.randn(8, 25, 32), jnp.float32)

        g_tiny = jax.grad(
            lambda q, k, v: jnp.sum(tiny_attention_packed(q, k, v, 2) * ct),
            argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(
            lambda q, k, v: jnp.sum(_xla_packed_reference(q, k, v, 2) * ct),
            argnums=(0, 1, 2))(q, k, v)
        for gt, gr, name in zip(g_tiny, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5,
                                       err_msg=f"d{name} mismatch")

    def test_pallas_bwd_matches_xla_fallback(self, monkeypatch):
        import vista_tpu.ops.tiny_attention as mod

        rng = np.random.RandomState(4)
        q, k, v, ct = (jnp.asarray(rng.randn(4, 16, 32), jnp.float32)
                       for _ in range(4))
        loss = lambda q, k, v: jnp.sum(tiny_attention_packed(q, k, v, 2) * ct)
        g_pallas = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setattr(mod, "_PALLAS_BWD", False)
        g_xla = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for gp, gx in zip(g_pallas, g_xla):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                       atol=2e-5, rtol=2e-5)


class TestAttentionPackedDispatch:
    def test_packed_matches_xla_multihead(self):
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(3, 25, 48), jnp.float32)
        k = jnp.asarray(rng.randn(3, 25, 48), jnp.float32)
        v = jnp.asarray(rng.randn(3, 25, 48), jnp.float32)
        out_p = attention_packed(q, k, v, 3, backend="pallas")
        out_x = attention_packed(q, k, v, 3, backend="xla")
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=2e-5, rtol=2e-5)

    def test_packed_flash_multihead(self):
        # long-seq path: heads sliced from the packed minor dim by the grid
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(1, 2048, 32), jnp.float32)
        k = jnp.asarray(rng.randn(1, 2048, 32), jnp.float32)
        v = jnp.asarray(rng.randn(1, 2048, 32), jnp.float32)
        out_p = attention_packed(q, k, v, 2, backend="pallas")
        out_x = attention_packed(q, k, v, 2, backend="xla")
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=2e-5, rtol=2e-5)
