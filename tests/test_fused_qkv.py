"""Parity of the fused pre-LN QKV kernel vs the module composition.

Interpreter mode on CPU; compiled path runs on TPU in every spatial
transformer block's self-attention. Reference: vwm/modules/attention.py:
176-219 (to_q/to_k/to_v of the pre-LN CrossAttention blocks).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vista_tpu.models.attention import CrossAttention, LayerNorm, TransformerBlock
from vista_tpu.ops.fused_qkv import _xla_reference, fused_ln_qkv, qkv_input_supported


def _make(shape, inner, seed=0):
    rng = np.random.RandomState(seed)
    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    ln_s = jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32)
    ln_b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng.randn(c, inner) * (c ** -0.5), jnp.float32)
          for _ in range(3)]
    return x, ln_s, ln_b, ws


class TestFusedQKV:
    def _check(self, shape, inner, tol=3e-2):
        x, ln_s, ln_b, (wq, wk, wv) = _make(shape, inner)
        q, k, v = fused_ln_qkv(x, ln_s, ln_b, wq, wk, wv)
        y = LayerNorm().apply({"params": {"ln": {"scale": ln_s, "bias": ln_b}}}, x)
        yb = y.astype(jnp.bfloat16)
        for got, w in [(q, wq), (k, wk), (v, wv)]:
            ref = yb @ w.astype(jnp.bfloat16)
            assert got.shape == shape[:-1] + (inner,)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(ref, np.float32),
                                       atol=tol, rtol=tol)

    def test_rank2(self):
        self._check((128, 32), 64)

    def test_rank3_aligned(self):
        self._check((2, 64, 32), 32)

    def test_gate(self):
        assert qkv_input_supported((2, 64, 320), 320)
        assert qkv_input_supported((50, 576, 1280), 1280)
        assert not qkv_input_supported((2, 25, 320), 320)   # unaligned mid
        assert not qkv_input_supported((2, 64, 2560), 2560)  # too wide

    def test_grads_match_reference(self):
        rng = np.random.RandomState(1)
        c, inner = 16, 32
        x = jnp.asarray(rng.randn(4, 8, c), jnp.float32)
        ln_s = jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32)
        ln_b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        wq, wk, wv = (jnp.asarray(rng.randn(c, inner) * 0.2, jnp.float32)
                      for _ in range(3))
        cts = tuple(jnp.asarray(rng.randn(4, 8, inner), jnp.float32)
                    for _ in range(3))

        def loss(fn):
            def f(*a):
                q, k, v = fn(*a)
                return jnp.sum(q * cts[0]) + jnp.sum(k * cts[1]) + jnp.sum(v * cts[2])
            return f

        g_fused = jax.grad(loss(fused_ln_qkv), argnums=(0, 1, 2, 3, 4, 5))(
            x, ln_s, ln_b, wq, wk, wv)
        g_ref = jax.grad(loss(_xla_reference), argnums=(0, 1, 2, 3, 4, 5))(
            x, ln_s, ln_b, wq, wk, wv)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

    def test_pallas_bwd_multi_tile_accumulators(self, monkeypatch):
        # force several grid steps so the sequential-grid dW/dln accumulators
        # are exercised across tiles (init at step 0, += after)
        import vista_tpu.ops.fused_qkv as qkv_mod

        rng = np.random.RandomState(3)
        c, inner = 16, 32
        x = jnp.asarray(rng.randn(8, 8, c), jnp.float32)
        ln_s = jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32)
        ln_b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        wq, wk, wv = (jnp.asarray(rng.randn(c, inner) * 0.2, jnp.float32)
                      for _ in range(3))
        cts = tuple(jnp.asarray(rng.randn(8, 8, inner), jnp.float32)
                    for _ in range(3))

        def loss(fn):
            def f(*a):
                q, k, v = fn(*a)
                return jnp.sum(q * cts[0]) + jnp.sum(k * cts[1]) + jnp.sum(v * cts[2])
            return f

        monkeypatch.setattr(qkv_mod, "_tile_rows", lambda n, t: 16)  # 4 steps
        g_fused = jax.grad(loss(fused_ln_qkv), argnums=tuple(range(6)))(
            x, ln_s, ln_b, wq, wk, wv)
        g_ref = jax.grad(loss(_xla_reference), argnums=tuple(range(6)))(
            x, ln_s, ln_b, wq, wk, wv)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=2e-5, rtol=2e-5)

    def test_chunked_bwd_matches_unchunked(self, monkeypatch):
        # the lax.map-chunked XLA fallback (full-res memory fix, still the
        # path behind MAX_FUSED_BWD_DIM=0) must match the unchunked
        # recompute exactly up to dW reduction order
        import vista_tpu.ops.fused_qkv as qkv_mod

        monkeypatch.setattr(qkv_mod, "MAX_FUSED_BWD_DIM", 0)  # force XLA path
        rng = np.random.RandomState(2)
        c, inner = 16, 32
        x = jnp.asarray(rng.randn(8, 8, c), jnp.float32)
        ln_s = jnp.asarray(rng.randn(c) * 0.2 + 1, jnp.float32)
        ln_b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        wq, wk, wv = (jnp.asarray(rng.randn(c, inner) * 0.2, jnp.float32)
                      for _ in range(3))
        cts = tuple(jnp.asarray(rng.randn(8, 8, inner), jnp.float32)
                    for _ in range(3))

        def f(*a):
            q, k, v = fused_ln_qkv(*a)
            return jnp.sum(q * cts[0]) + jnp.sum(k * cts[1]) + jnp.sum(v * cts[2])

        g_unchunked = jax.grad(f, argnums=tuple(range(6)))(x, ln_s, ln_b, wq, wk, wv)
        monkeypatch.setattr(qkv_mod, "_BWD_TEMP_BYTES", 1)  # force max chunking
        assert qkv_mod._bwd_chunks(64, 3 * inner) > 1
        g_chunked = jax.grad(f, argnums=tuple(range(6)))(x, ln_s, ln_b, wq, wk, wv)
        for gc, gu in zip(g_chunked, g_unchunked):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gu),
                                       atol=1e-5, rtol=1e-5)

    def test_transformer_block_fused_matches_composed(self):
        """Forcing the fused path (pallas/interpret) == composed (xla)."""
        dim, heads, dim_head = 32, 2, 16
        x = jnp.asarray(np.random.RandomState(3).randn(2, 64, dim), jnp.bfloat16)
        ctx = jnp.asarray(np.random.RandomState(4).randn(2, 1, dim), jnp.bfloat16)
        blk_p = TransformerBlock(dim=dim, heads=heads, dim_head=dim_head,
                                 context_dim=dim, backend="pallas")
        blk_x = TransformerBlock(dim=dim, heads=heads, dim_head=dim_head,
                                 context_dim=dim, backend="xla")
        params = blk_x.init(jax.random.key(0), x, ctx)
        out_p = blk_p.apply(params, x, ctx)
        out_x = blk_x.apply(params, x, ctx)
        np.testing.assert_allclose(np.asarray(out_p, np.float32),
                                   np.asarray(out_x, np.float32),
                                   atol=3e-2, rtol=3e-2)

    def test_param_tree_identical_across_backends(self):
        dim, heads, dim_head = 32, 2, 16
        x = jnp.zeros((2, 64, dim), jnp.bfloat16)
        ctx = jnp.zeros((2, 1, dim), jnp.bfloat16)
        p_p = TransformerBlock(dim=dim, heads=heads, dim_head=dim_head,
                               context_dim=dim, backend="pallas").init(
            jax.random.key(0), x, ctx)
        p_x = TransformerBlock(dim=dim, heads=heads, dim_head=dim_head,
                               context_dim=dim, backend="xla").init(
            jax.random.key(0), x, ctx)
        paths_p = {jax.tree_util.keystr(k) for k, _ in
                   jax.tree_util.tree_flatten_with_path(p_p)[0]}
        paths_x = {jax.tree_util.keystr(k) for k, _ in
                   jax.tree_util.tree_flatten_with_path(p_x)[0]}
        assert paths_p == paths_x
