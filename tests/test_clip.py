"""CLIP vision tower contracts (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp

from vista_tpu.models.clip import (
    CLIPVisionConfig,
    CLIPVisionTower,
    clip_preprocess,
)


class TestCLIP:
    def test_preprocess_range_and_shape(self):
        frames = jnp.zeros((2, 64, 96, 3))  # mid-gray in [-1,1]
        out = clip_preprocess(frames, image_size=28)
        assert out.shape == (2, 28, 28, 3)
        # [-1,1] zero -> 0.5 -> (0.5-mean)/std per channel
        expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
            [0.26862954, 0.26130258, 0.27577711])
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, atol=1e-4)

    def test_tower_output(self):
        cfg = CLIPVisionConfig(dtype="float32").tiny()
        tower = CLIPVisionTower(cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(2, cfg.image_size, cfg.image_size, 3),
                        jnp.float32)
        params = tower.init(jax.random.key(0), x)
        out = tower.apply(params, x)
        assert out.shape == (2, cfg.output_dim)
        assert np.isfinite(np.asarray(out)).all()
        # distinct inputs -> distinct embeddings
        out2 = tower.apply(params, -x)
        assert not np.allclose(np.asarray(out), np.asarray(out2))
