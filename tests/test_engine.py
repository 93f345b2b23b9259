"""Integration contracts: VAE round trip, engine sampling, rollout, reward.

All on tiny configs — these are shape/semantics tests, not quality tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vista_tpu.diffusion import GuiderConfig, SamplerConfig
from vista_tpu.engine import EngineConfig, RolloutConfig, VistaEngine, autoregressive_rollout
from vista_tpu.engine.reward import estimate_reward

H = W = 32  # pixel resolution for tiny tests (VAE tiny downsamples 2x)


@pytest.fixture(scope="module")
def setup():
    cfg = EngineConfig().tiny()
    # run everything fp32 on CPU
    import dataclasses
    cfg = dataclasses.replace(
        cfg,
        unet=dataclasses.replace(cfg.unet, dtype="float32"),
        vae=dataclasses.replace(cfg.vae, dtype="float32"),
        conditioner=dataclasses.replace(
            cfg.conditioner,
            clip=dataclasses.replace(cfg.conditioner.clip, dtype="float32"),
            vae=dataclasses.replace(cfg.conditioner.vae, dtype="float32"),
        ),
    )
    engine = VistaEngine(cfg)
    params = engine.init_params(jax.random.key(0), H, W)
    return cfg, engine, params


def _batch(cfg):
    t = cfg.num_frames
    return {
        "fps_id": jnp.array([9.0]),
        "motion_bucket_id": jnp.array([127.0]),
        "cond_aug": jnp.array([0.0]),
    }


class TestFirstStage:
    def test_encode_decode_shapes(self, setup):
        cfg, engine, params = setup
        t = cfg.num_frames
        pixels = jnp.asarray(np.random.RandomState(0).randn(t, H, W, 3) * 0.5, jnp.float32)
        z = engine.encode_first_stage(params, pixels, key=jax.random.key(1))
        f = cfg.vae.downsample_factor
        assert z.shape == (t, H // f, W // f, cfg.vae.z_channels)
        out = engine.decode_first_stage(params, z)
        assert out.shape == (t, H, W, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_encoder_shared_with_conditioner(self, setup):
        """The conditioner's cond-frame encoder must reuse first-stage weights."""
        cfg, engine, params = setup
        enc = params["encoder"]
        tied = params["conditioner"]["cond_frames_encoder"]
        a = jax.tree.leaves(enc)
        b = jax.tree.leaves(tied)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_overlap_blend_decode_matches_plain_on_short_input(self, setup):
        cfg, engine, params = setup
        # n <= chunk -> single decode, no blending
        z = jnp.asarray(np.random.RandomState(1).randn(2, H // 2, W // 2, 4), jnp.float32)
        out = engine.decode_first_stage(params, z)
        assert out.shape == (2, H, W, 3)


class TestConditioner:
    def test_condition_pair_shapes(self, setup):
        cfg, engine, params = setup
        batch = _batch(cfg)
        batch["cond_frames_without_noise"] = jnp.zeros((1, H, W, 3))
        batch["cond_frames"] = jnp.zeros((1, H, W, 3))
        c, uc = engine.condition_pair(params, batch)
        assert c["vector"].shape == (1, 3 * cfg.conditioner.vector_outdim)
        assert c["crossattn"].shape[0] == 1 and c["crossattn"].ndim == 3
        f = cfg.vae.downsample_factor
        assert c["concat"].shape == (1, H // f, W // f, cfg.vae.z_channels)
        # uc forces frames to zero
        np.testing.assert_allclose(np.asarray(uc["concat"]), 0.0)
        np.testing.assert_allclose(np.asarray(uc["crossattn"]), 0.0)
        assert not np.allclose(np.asarray(c["crossattn"]), 0.0)


class TestRollout:
    def test_two_round_rollout_shapes_and_pinning(self, setup):
        cfg, engine, params = setup
        t = cfg.num_frames
        images = jnp.asarray(np.random.RandomState(0).randn(t, H, W, 3) * 0.2, jnp.float32)
        sampler = SamplerConfig(num_steps=2, guider=GuiderConfig(kind="vanilla", scale=2.0, num_frames=t))
        pixels, latents = autoregressive_rollout(
            engine, params, images, _batch(cfg), sampler,
            RolloutConfig(num_rounds=2, n_context_frames=1),
            key=jax.random.key(0),
        )
        # num_rounds*(t-1)+1 frames with n_context_frames=1
        assert latents.shape[0] == 2 * (t - 1) + 1
        assert pixels.shape == (latents.shape[0], H, W, 3)
        assert np.isfinite(np.asarray(pixels)).all()
        assert float(pixels.min()) >= 0.0 and float(pixels.max()) <= 1.0


class TestReward:
    def test_reward_scalar_in_unit_interval(self, setup):
        cfg, engine, params = setup
        t = cfg.num_frames
        images = jnp.asarray(np.random.RandomState(0).randn(t, H, W, 3) * 0.2, jnp.float32)
        sampler = SamplerConfig(num_steps=2, guider=GuiderConfig(kind="vanilla", scale=1.5, num_frames=t))
        r = estimate_reward(engine, params, images, _batch(cfg), sampler,
                            ensemble_size=2, key=jax.random.key(0))
        r = float(r)
        assert 0.0 < r <= 1.0
