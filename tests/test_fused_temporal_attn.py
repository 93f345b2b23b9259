"""Parity of the fully-fused temporal self-attention kernel.

Interpreter mode on CPU; compiled path runs on TPU in every temporal
transformer block. Reference: vwm/modules/video_attention.py:12-144.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vista_tpu.models.attention import CrossAttention, LayerNorm
from vista_tpu.ops.fused_temporal_attn import (
    _xla_reference,
    fused_temporal_attn_supported,
    fused_temporal_self_attn,
)


def _module_reference(x, ln_s, ln_b, wq, wk, wv, wo, bo, heads):
    d = wq.shape[1] // heads
    y = LayerNorm().apply({"params": {"ln": {"scale": ln_s, "bias": ln_b}}}, x)
    attn = CrossAttention(heads=heads, dim_head=d, query_dim=x.shape[-1],
                          backend="xla")
    params = {"params": {"to_q": {"kernel": wq}, "to_k": {"kernel": wk},
                         "to_v": {"kernel": wv},
                         "to_out": {"kernel": wo, "bias": bo}}}
    return x + attn.apply(params, y)


def _make(rows, t, c, heads, seed=0):
    rng = np.random.RandomState(seed)
    inner = c
    x = jnp.asarray(rng.randn(rows, t, c), jnp.bfloat16)
    args = (
        jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32),
        jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(c, inner) * (c ** -0.5), jnp.float32),
        jnp.asarray(rng.randn(c, inner) * (c ** -0.5), jnp.float32),
        jnp.asarray(rng.randn(c, inner) * (c ** -0.5), jnp.float32),
        jnp.asarray(rng.randn(inner, c) * (inner ** -0.5), jnp.float32),
        jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
    )
    return x, args


class TestFusedTemporalAttn:
    def test_matches_module_composition(self):
        x, args = _make(rows=8, t=16, c=32, heads=2)
        out = fused_temporal_self_attn(x, *args, 2, x.shape[1])
        ref = _module_reference(x, *args, heads=2)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=4e-2, rtol=4e-2)

    def test_matches_fp32_reference_tight(self):
        x, args = _make(rows=4, t=8, c=16, heads=1)
        x = x.astype(jnp.float32)
        out = fused_temporal_self_attn(x, *args, 1, x.shape[1])
        ref = _xla_reference(x, *args, num_heads=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_grads_match_reference(self):
        x, args = _make(rows=4, t=8, c=16, heads=2, seed=1)
        x = x.astype(jnp.float32)
        ct = jnp.asarray(np.random.RandomState(2).randn(*x.shape), jnp.float32)
        g_fused = jax.grad(
            lambda *a: jnp.sum(fused_temporal_self_attn(*a, 2, x.shape[1]) * ct),
            argnums=tuple(range(8)))(x, *args)
        g_ref = jax.grad(
            lambda *a: jnp.sum(_xla_reference(*a, num_heads=2) * ct),
            argnums=tuple(range(8)))(x, *args)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

    def test_pallas_bwd_multi_group_accumulators(self, monkeypatch):
        # force several grid steps so the sequential-grid dW/dln accumulators
        # are exercised across row groups (init at step 0, += after)
        import vista_tpu.ops.fused_temporal_attn as mod

        monkeypatch.setattr(mod, "_bwd_group_rows", lambda *a: 2)  # 4 steps
        x, args = _make(rows=8, t=8, c=16, heads=2, seed=4)
        x = x.astype(jnp.float32)
        ct = jnp.asarray(np.random.RandomState(5).randn(*x.shape), jnp.float32)
        g_fused = jax.grad(
            lambda *a: jnp.sum(fused_temporal_self_attn(*a, 2, x.shape[1]) * ct),
            argnums=tuple(range(8)))(x, *args)
        g_ref = jax.grad(
            lambda *a: jnp.sum(_xla_reference(*a, num_heads=2) * ct),
            argnums=tuple(range(8)))(x, *args)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

    def test_pallas_bwd_padded_frames(self):
        # cotangent is zero on padded query rows (slice VJP) and padded key
        # columns have p == 0: grads must match the XLA VJP incl. the mask
        x, args = _make(rows=4, t=8, c=16, heads=2, seed=6)
        x = x.astype(jnp.float32)
        valid = 5
        ct = np.zeros(x.shape, np.float32)
        ct[:, :valid] = np.random.RandomState(7).randn(4, valid, 16)
        ct = jnp.asarray(ct)
        g_fused = jax.grad(
            lambda *a: jnp.sum(fused_temporal_self_attn(*a, 2, valid) * ct),
            argnums=tuple(range(8)))(x, *args)
        g_ref = jax.grad(
            lambda *a: jnp.sum(_xla_reference(*a, num_heads=2, valid_t=valid) * ct),
            argnums=tuple(range(8)))(x, *args)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

    def test_xla_fallback_bwd_matches(self, monkeypatch):
        import vista_tpu.ops.fused_temporal_attn as mod

        x, args = _make(rows=4, t=8, c=16, heads=2, seed=8)
        x = x.astype(jnp.float32)
        ct = jnp.asarray(np.random.RandomState(9).randn(*x.shape), jnp.float32)
        loss = lambda *a: jnp.sum(fused_temporal_self_attn(*a, 2, x.shape[1]) * ct)
        g_pallas = jax.grad(loss, argnums=tuple(range(8)))(x, *args)
        monkeypatch.setattr(mod, "_PALLAS_BWD", False)
        g_xla = jax.grad(loss, argnums=tuple(range(8)))(x, *args)
        for gp, gx in zip(g_pallas, g_xla):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                       atol=2e-5, rtol=2e-5)

    def test_gate(self):
        # t must be sublane-aligned (callers pad 25 -> 32)
        assert fused_temporal_attn_supported(32, 320, 320)
        assert not fused_temporal_attn_supported(25, 320, 320)
        assert not fused_temporal_attn_supported(2304, 320, 320)

    def test_padded_frames_masked(self):
        # padded key slots must not influence the valid frames
        x, args = _make(rows=8, t=25, c=32, heads=2, seed=3)
        xp = jnp.pad(x, ((0, 0), (0, 7), (0, 0)), constant_values=37.0)
        out = fused_temporal_self_attn(xp, *args, 2, 25)[:, :25]
        ref = _module_reference(x, *args, heads=2)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=4e-2, rtol=4e-2)

    def test_temporal_core_param_tree_stable(self):
        # fused dispatch keeps CrossAttention's param paths under attn1
        from vista_tpu.models.attention import TemporalTransformerBlock

        blk = TemporalTransformerBlock(dim=32, heads=2, dim_head=16,
                                       context_dim=32)
        x = jnp.zeros((8, 9, 32), jnp.bfloat16)
        tc = jnp.zeros((2, 1, 32), jnp.bfloat16)
        p = blk.init(jax.random.key(0), x, num_frames=4, time_context=tc)
        attn1 = p["params"]["core"]["attn1"]
        assert set(attn1.keys()) == {"to_q", "to_k", "to_v", "to_out"}
        assert set(attn1["to_out"].keys()) == {"kernel", "bias"}
        assert set(p["params"]["core"]["norm1"]["ln"].keys()) == {"scale", "bias"}
