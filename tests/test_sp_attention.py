"""Sequence-parallel attention correctness on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vista_tpu.ops.attention import dot_product_attention
from vista_tpu.parallel import make_mesh
from vista_tpu.parallel.sp_attention import sp_attention


class TestSPAttention:
    def test_matches_single_device(self):
        assert len(jax.devices()) == 8
        mesh = make_mesh({"sp": 8})
        rng = np.random.RandomState(0)
        b, s, h, d = 2, 256, 4, 16
        q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        ref = dot_product_attention(q, k, v)
        out = jax.jit(lambda q, k, v: sp_attention(q, k, v, mesh))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_sharded_inputs(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh({"sp": 8})
        rng = np.random.RandomState(1)
        b, s, h, d = 1, 512, 2, 16
        mk = lambda seed: jax.device_put(
            jnp.asarray(rng.randn(b, s, h, d), jnp.float32),
            NamedSharding(mesh, P(None, "sp")))
        q, k, v = mk(0), mk(1), mk(2)
        ref = dot_product_attention(q, k, v)
        out = jax.jit(lambda q, k, v: sp_attention(q, k, v, mesh))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
