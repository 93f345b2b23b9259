"""Parity of the frame-major temporal conv kernel.

Interpreter mode on CPU; compiled path runs on TPU in every VideoResBlock.
Reference: the (3,1,1) Conv3d of vwm/modules/diffusionmodules/video_model.py
(VideoResBlock time_stack) / util.py (AE3DConv).
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from vista_tpu.models.blocks import TemporalConv
from vista_tpu.ops.temporal_conv import (
    _silu_f32,
    _xla_reference,
    fused_gn_silu_conv3_emb,
    fused_gn_silu_conv3_res,
    temporal_conv3,
    temporal_conv3_supported,
)


def _make(b, t, s, cin, cout, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b * t, s, cin), dtype)
    w = jnp.asarray(rng.randn(3, cin, cout) * (3 * cin) ** -0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(cout) * 0.05, jnp.float32)
    return x, w, bias


class TestTemporalConv3:
    def test_matches_xla_reference(self):
        x, w, b = _make(b=2, t=4, s=16, cin=16, cout=16)
        out = temporal_conv3(x, w, b, 4)
        ref = _xla_reference(x, w, b, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_video_boundaries_are_independent(self):
        """SAME zero padding applies per video: changing video 0's frames
        never leaks into video 1's output (the clamped neighbor block at the
        boundary must be fully masked)."""
        x, w, b = _make(b=2, t=4, s=8, cin=8, cout=8, seed=1)
        base = np.asarray(temporal_conv3(x, w, b, 4))
        x2 = x.at[:4].set(jnp.asarray(np.random.RandomState(2).randn(4, 8, 8),
                                      x.dtype))
        out2 = np.asarray(temporal_conv3(x2, w, b, 4))
        np.testing.assert_allclose(out2[4:], base[4:], atol=1e-5, rtol=1e-5)
        assert not np.allclose(out2[:4], base[:4])

    def test_channel_change(self):
        x, w, b = _make(b=1, t=3, s=8, cin=8, cout=24, seed=3)
        out = temporal_conv3(x, w, b, 3)
        ref = _xla_reference(x, w, b, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_grads_match_reference(self):
        x, w, b = _make(b=1, t=4, s=8, cin=8, cout=8, seed=4)

        def loss_k(x, w, b):
            return jnp.sum(temporal_conv3(x, w, b, 4) ** 2)

        def loss_r(x, w, b):
            return jnp.sum(_xla_reference(x, w, b, 4) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
        for a, r in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-4, rtol=1e-4)

    def test_supported_gate(self):
        assert temporal_conv3_supported(9216, 320, 320)
        assert temporal_conv3_supported(144, 1280, 1280)
        assert not temporal_conv3_supported(9215, 320, 320)


def _ref_gn_conv(x, sc, sh, w, b, t, emb=None, residual=None, rs=None):
    """Independent composition: affine+SiLU in XLA, conv via _xla_reference."""
    a = x.astype(jnp.float32) * sc[:, None, :] + sh[:, None, :]
    xn = _silu_f32(a).astype(x.dtype)
    y = _xla_reference(xn, w, b, t).astype(jnp.float32)
    if emb is not None:
        y = y + emb.astype(jnp.float32)[:, None, :]
    if residual is not None:
        y = residual.astype(jnp.float32) + rs * y
    return y.astype(x.dtype)


class TestFusedGNSiluConv3:
    def _args(self, seed=0, bt=8, s=16, c=8):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(bt, s, c), jnp.float32)
        sc = jnp.asarray(rng.rand(bt, c) + 0.5, jnp.float32)
        sh = jnp.asarray(rng.randn(bt, c) * 0.1, jnp.float32)
        w = jnp.asarray(rng.randn(3, c, c) * 0.2, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
        return x, sc, sh, w, b

    def test_emb_matches_reference(self):
        x, sc, sh, w, b = self._args()
        emb = jnp.asarray(np.random.RandomState(1).randn(8, 8), jnp.float32)
        out = fused_gn_silu_conv3_emb(x, sc, sh, w, b, emb, 4)
        ref = _ref_gn_conv(x, sc, sh, w, b, 4, emb=emb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_res_matches_reference(self):
        x, sc, sh, w, b = self._args(seed=2)
        res = jnp.asarray(np.random.RandomState(3).randn(8, 16, 8), jnp.float32)
        rs = jnp.asarray(0.7, jnp.float32)
        out = fused_gn_silu_conv3_res(x, sc, sh, w, b, res, rs, 4)
        ref = _ref_gn_conv(x, sc, sh, w, b, 4, residual=res, rs=rs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_grads_match_reference(self):
        x, sc, sh, w, b = self._args(seed=4)
        res = jnp.asarray(np.random.RandomState(5).randn(8, 16, 8), jnp.float32)
        rs = jnp.asarray(0.6, jnp.float32)
        lk = lambda *a: jnp.sum(fused_gn_silu_conv3_res(*a, 4) ** 2)
        lr = lambda *a: jnp.sum(_ref_gn_conv(a[0], a[1], a[2], a[3], a[4], 4,
                                             residual=a[5], rs=a[6]) ** 2)
        gk = jax.grad(lk, argnums=tuple(range(7)))(x, sc, sh, w, b, res, rs)
        gr = jax.grad(lr, argnums=tuple(range(7)))(x, sc, sh, w, b, res, rs)
        for a, r in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-4, rtol=1e-4)

    def test_video_boundary_isolation(self):
        x, sc, sh, w, b = self._args(seed=6)
        emb = jnp.zeros((8, 8), jnp.float32)
        base = np.asarray(fused_gn_silu_conv3_emb(x, sc, sh, w, b, emb, 4))
        x2 = x.at[:4].add(1.0)
        out2 = np.asarray(fused_gn_silu_conv3_emb(x2, sc, sh, w, b, emb, 4))
        np.testing.assert_allclose(out2[4:], base[4:], atol=1e-5, rtol=1e-5)


class TestTemporalConvModule:
    def test_params_match_nn_conv_layout(self):
        mod = TemporalConv(8, (3, 1, 1))
        ref = nn.Conv(8, kernel_size=(3, 1, 1), padding="SAME",
                      dtype=jnp.bfloat16, param_dtype=jnp.float32)
        x = jnp.zeros((1, 4, 2, 3, 8))
        p1 = mod.init(jax.random.key(0), x)["params"]
        p2 = ref.init(jax.random.key(0), x)["params"]
        assert jax.tree.map(jnp.shape, p1) == jax.tree.map(jnp.shape, p2)

    def test_xla_path_matches_nn_conv(self):
        """The module's general path reproduces flax nn.Conv exactly
        (golden-parity safety: same math, same params)."""
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, 4, 3, 5, 8), jnp.float32)
        ref = nn.Conv(16, kernel_size=(3, 1, 1), padding="SAME",
                      dtype=jnp.float32, param_dtype=jnp.float32)
        params = ref.init(jax.random.key(1), x)
        out_ref = ref.apply(params, x)
        out = TemporalConv(16, (3, 1, 1), dtype=jnp.float32).apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   atol=1e-5, rtol=1e-5)


class TestTemporalResBlockFusedEquivalence:
    def test_fused_and_nonfused_paths_agree(self, monkeypatch):
        """The --fused-gn A/B baseline can't silently drift: both
        TemporalResBlock paths (fused Pallas kernels, interpret mode on CPU,
        vs the XLA compose) share params and must agree on a supported
        shape. Covers the emb bias, second GN, residual, and the collapsed
        AlphaBlender epilogue."""
        import vista_tpu.ops.temporal_conv as _tc
        from vista_tpu.models.blocks import TemporalResBlock

        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 4, 2, 4, 8), jnp.float32)   # s=8, c=8
        emb = jnp.asarray(rng.randn(2, 4, 16), jnp.float32)
        alpha = jnp.asarray(0.3, jnp.float32)
        mod = TemporalResBlock(8, 16, (3, 1, 1), dtype=jnp.float32)
        params = mod.init(jax.random.key(2), x, emb, alpha)
        # zero-init out_conv makes h2 degenerate; randomize all params
        params = jax.tree.map(
            lambda p: p + 0.1 * np.random.RandomState(8).randn(*p.shape).astype(p.dtype),
            params)

        monkeypatch.setattr(_tc, "_FUSED_GN_ON_CPU", True)
        monkeypatch.setattr(_tc, "_FUSED_GN", True)
        out_fused = mod.apply(params, x, emb, alpha)
        monkeypatch.setattr(_tc, "_FUSED_GN", False)
        out_plain = mod.apply(params, x, emb, alpha)
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_plain),
                                   atol=1e-5, rtol=1e-5)
