"""Parity of the Pallas LayerNorm kernel vs flax (fp32-stat) LayerNorm.

Interpreter mode on CPU; the compiled path runs on TPU inside every
transformer block (models/attention.py LayerNorm).
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from vista_tpu.ops.norms import layer_norm


def _ref(x, g, b, eps=1e-5):
    ln = nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32)
    return ln.apply({"params": {"scale": g, "bias": b}},
                    x.astype(jnp.float32)).astype(x.dtype)


class TestLayerNorm:
    def _check(self, shape, seed=0):
        rng = np.random.RandomState(seed)
        c = shape[-1]
        x = jnp.asarray(rng.randn(*shape) * 2 + 1, jnp.bfloat16)
        g = jnp.asarray(rng.randn(c), jnp.float32)
        b = jnp.asarray(rng.randn(c), jnp.float32)
        out = layer_norm(x, g, b)
        ref = _ref(x, g, b)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=3e-2)  # bf16 output quantization

    def test_transformer_shape(self):
        self._check((6, 25, 320))

    def test_2d(self):
        self._check((64, 128))

    def test_odd_rows(self):
        # odd rows + sublane-unaligned mid -> rank-3 path, single whole tile
        self._check((9, 7, 33))

    def test_fp32_passthrough_dtype(self):
        x = jnp.asarray(np.random.RandomState(1).randn(4, 16), jnp.float32)
        g = jnp.ones((16,), jnp.float32)
        b = jnp.zeros((16,), jnp.float32)
        out = layer_norm(x, g, b)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, g, b)),
                                   atol=1e-5, rtol=1e-5)

    def test_module_param_tree_matches_flax(self):
        # the LayerNorm module must keep nn.LayerNorm's param paths
        # (ln/scale, ln/bias) for checkpoint/key-map compatibility
        from vista_tpu.models.attention import LayerNorm

        m = LayerNorm()
        p = m.init(jax.random.key(0), jnp.zeros((2, 8), jnp.bfloat16))
        assert set(p["params"].keys()) == {"ln"}
        assert set(p["params"]["ln"].keys()) == {"scale", "bias"}


class TestLayerNormGrad:
    def test_grads_match_xla(self):
        # a raw pallas_call has no autodiff rule; the custom VJP must make
        # layer_norm differentiable (TPU training goes through it)
        import numpy as np
        import jax
        import jax.numpy as jnp
        from vista_tpu.ops.norms import _layer_norm_xla, layer_norm

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 8, 16), jnp.float32)
        g = jnp.asarray(rng.randn(16) * 0.2 + 1, jnp.float32)
        b = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
        ct = jnp.asarray(rng.randn(4, 8, 16), jnp.float32)

        gr_f = jax.grad(lambda *a: jnp.sum(layer_norm(*a) * ct), argnums=(0, 1, 2))(x, g, b)
        gr_r = jax.grad(lambda *a: jnp.sum(_layer_norm_xla(*a) * ct), argnums=(0, 1, 2))(x, g, b)
        for a, r in zip(gr_f, gr_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-5, rtol=2e-5)
