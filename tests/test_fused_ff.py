"""Parity of the fused pre-LN GEGLU FF kernel vs the module composition.

Interpreter mode on CPU; compiled path runs on TPU in every transformer
block. Reference: vwm/modules/attention.py:48-72 (GEGLU/FeedForward) inside
the pre-LN blocks (attention.py:424-524).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vista_tpu.models.attention import GEGLUFeedForward, LayerNorm
from vista_tpu.ops.fused_ff import ff_shape_supported, fused_geglu_ff


def _module_reference(x, ln_s, ln_b, w1, b1, w2, b2):
    dim = x.shape[-1]
    y = LayerNorm().apply({"params": {"ln": {"scale": ln_s, "bias": ln_b}}}, x)
    ff = GEGLUFeedForward(dim)
    params = {"params": {"proj_in": {"kernel": w1, "bias": b1},
                         "proj_out": {"kernel": w2, "bias": b2}}}
    return x + ff.apply(params, y)


class TestFusedGEGLU:
    def _check(self, shape, seed=0, tol=3e-2):
        rng = np.random.RandomState(seed)
        c = shape[-1]
        inner = 4 * c
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        ln_s = jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32)
        ln_b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.randn(c, 2 * inner) * (c ** -0.5), jnp.float32)
        b1 = jnp.asarray(rng.randn(2 * inner) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.randn(inner, c) * (inner ** -0.5), jnp.float32)
        b2 = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
        out = fused_geglu_ff(x, ln_s, ln_b, w1, b1, w2, b2)
        ref = _module_reference(x, ln_s, ln_b, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=tol, rtol=tol)

    def test_spatial_tokens_2d_path(self):
        self._check((2, 64, 32))  # aligned middle dim -> 2D token path

    def test_temporal_3d_path(self):
        self._check((8, 25, 32))  # t=25 sublane-padded -> 3D-native path

    def test_gate(self):
        assert ff_shape_supported(320)
        assert ff_shape_supported(640)
        assert ff_shape_supported(1280)  # 39MB of weights still fit VMEM
        assert not ff_shape_supported(2560)
        assert not ff_shape_supported(324)  # unaligned

    def test_grads_match_module(self):
        rng = np.random.RandomState(1)
        c, inner = 16, 64
        x = jnp.asarray(rng.randn(4, 8, c), jnp.float32)
        args = (
            jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c, 2 * inner) * 0.2, jnp.float32),
            jnp.asarray(rng.randn(2 * inner) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(inner, c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
        )
        ct = jnp.asarray(rng.randn(4, 8, c), jnp.float32)
        from vista_tpu.ops.fused_ff import _xla_reference

        g_fused = jax.grad(lambda *a: jnp.sum(fused_geglu_ff(*a) * ct),
                           argnums=tuple(range(7)))(x, *args)
        # tight vs the kernel's own fp32 math
        g_ref = jax.grad(lambda *a: jnp.sum(_xla_reference(*a) * ct),
                         argnums=tuple(range(7)))(x, *args)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)
        # loose vs the module composition (module computes matmuls in bf16)
        g_mod = jax.grad(lambda *a: jnp.sum(_module_reference(*a) * ct),
                         argnums=tuple(range(7)))(x, *args)
        for gf, gr in zip(g_fused, g_mod):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=4e-2, rtol=4e-2)

    def test_pallas_bwd_multi_tile_accumulators(self, monkeypatch):
        # force several grid steps so the sequential-grid dW/db/dln
        # accumulators are exercised across tiles (init at step 0, += after)
        import vista_tpu.ops.fused_ff as ff_mod

        rng = np.random.RandomState(3)
        c, inner = 16, 64
        x = jnp.asarray(rng.randn(8, 8, c), jnp.float32)
        args = (
            jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c, 2 * inner) * 0.2, jnp.float32),
            jnp.asarray(rng.randn(2 * inner) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(inner, c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
        )
        ct = jnp.asarray(rng.randn(8, 8, c), jnp.float32)
        from vista_tpu.ops.fused_ff import _xla_reference

        monkeypatch.setattr(ff_mod, "_tile_rows", lambda n, t: 16)  # 4 steps
        g_fused = jax.grad(lambda *a: jnp.sum(fused_geglu_ff(*a) * ct),
                           argnums=tuple(range(7)))(x, *args)
        g_ref = jax.grad(lambda *a: jnp.sum(_xla_reference(*a) * ct),
                         argnums=tuple(range(7)))(x, *args)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

    def test_chunked_bwd_matches_unchunked(self, monkeypatch):
        # wide layers (c=1280) exceed the Pallas-bwd VMEM budget and keep the
        # chunked XLA-recompute VJP; full-res training OOMed on the unchunked
        # fp32 recompute temps, so the lax.map-chunked VJP must be numerically
        # identical (row-independent math, only the dW reduction order differs)
        import vista_tpu.ops.fused_ff as ff_mod

        monkeypatch.setattr(ff_mod, "MAX_FUSED_BWD_DIM", 0)  # force XLA path
        monkeypatch.setattr(ff_mod, "_WIDE_PALLAS_BWD", False)
        rng = np.random.RandomState(2)
        c, inner = 16, 64
        x = jnp.asarray(rng.randn(8, 8, c), jnp.float32)
        args = (
            jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c, 2 * inner) * 0.2, jnp.float32),
            jnp.asarray(rng.randn(2 * inner) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(inner, c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
        )
        ct = jnp.asarray(rng.randn(8, 8, c), jnp.float32)
        loss = lambda *a: jnp.sum(fused_geglu_ff(*a) * ct)

        g_unchunked = jax.grad(loss, argnums=tuple(range(7)))(x, *args)
        monkeypatch.setattr(ff_mod, "_BWD_TEMP_BYTES", 1)  # force max chunking
        assert ff_mod._bwd_chunks(64, 2 * inner) > 1
        g_chunked = jax.grad(loss, argnums=tuple(range(7)))(x, *args)
        for gc, gu in zip(g_chunked, g_unchunked):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gu),
                                       atol=1e-5, rtol=1e-5)

    def test_wide_bwd_matches_reference(self, monkeypatch):
        # c > MAX_FUSED_BWD_DIM: the activation-export Pallas backward + XLA
        # dW matmuls must match fp32 autodiff of the kernel's exact math.
        # Forced at tiny c by lowering the narrow-path ceiling to 0.
        import vista_tpu.ops.fused_ff as ff_mod

        monkeypatch.setattr(ff_mod, "MAX_FUSED_BWD_DIM", 0)
        rng = np.random.RandomState(4)
        c, inner = 16, 64
        x = jnp.asarray(rng.randn(8, 8, c), jnp.float32)
        args = (
            jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c, 2 * inner) * 0.2, jnp.float32),
            jnp.asarray(rng.randn(2 * inner) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(inner, c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
        )
        ct = jnp.asarray(rng.randn(8, 8, c), jnp.float32)
        from vista_tpu.ops.fused_ff import _xla_reference

        loss = lambda *a: jnp.sum(fused_geglu_ff(*a) * ct)
        g_ref = jax.grad(lambda *a: jnp.sum(_xla_reference(*a) * ct),
                         argnums=tuple(range(7)))(x, *args)

        assert ff_mod._WIDE_PALLAS_BWD
        g_wide = jax.grad(loss, argnums=tuple(range(7)))(x, *args)
        for gw, gr in zip(g_wide, g_ref):
            np.testing.assert_allclose(np.asarray(gw), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

        # multi-tile grid: sequential db/dln accumulators across tiles
        monkeypatch.setattr(ff_mod, "_tile_rows", lambda n, t: min(n, 16))
        g_tiled = jax.grad(loss, argnums=tuple(range(7)))(x, *args)
        for gw, gr in zip(g_tiled, g_ref):
            np.testing.assert_allclose(np.asarray(gw), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

        # row-chunked lax.scan wrapper (full-res memory bound): identical
        # math, only the dW accumulation order differs
        monkeypatch.setattr(ff_mod, "_WIDE_CHUNK_BYTES", 1)
        g_chunked = jax.grad(loss, argnums=tuple(range(7)))(x, *args)
        for gw, gr in zip(g_chunked, g_ref):
            np.testing.assert_allclose(np.asarray(gw), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

    def test_transformer_block_param_tree_stable(self):
        # the fused dispatch must keep the exact param paths of the module
        # composition (checkpoint/key-map compatibility)
        from vista_tpu.models.attention import TransformerBlock

        blk = TransformerBlock(dim=32, heads=2, dim_head=16, context_dim=32)
        p = blk.init(jax.random.key(0), jnp.zeros((2, 9, 32), jnp.bfloat16),
                     jnp.zeros((2, 1, 32), jnp.bfloat16))
        ff = p["params"]["ff"]
        assert set(ff.keys()) == {"proj_in", "proj_out"}
        assert ff["proj_in"]["kernel"].shape == (32, 256)
        assert ff["proj_out"]["kernel"].shape == (128, 32)
        assert set(p["params"]["norm3"]["ln"].keys()) == {"scale", "bias"}
