"""Multi-chip inference: frame-sharded sampling equals single-device sampling.

Runs the tiny engine's full sampling program jitted over an 8-virtual-device
CPU mesh with the frame axis sharded (engine.jit_sample_sharded) and checks
the latents match the unsharded program. Counterpart of SURVEY.md §2.8 /
§5.7 (the reference has no multi-GPU inference path at all).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vista_tpu.diffusion.guidance import GuiderConfig
from vista_tpu.diffusion.sampler import SamplerConfig
from vista_tpu.engine.engine import EngineConfig, VistaEngine


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4+ virtual devices (conftest forces cpu x8)")
    # the sharded frame axis must divide over the mesh (tiny engine: t=4)
    return jax.sharding.Mesh(np.array(devs[:4]).reshape(4), ("data",))


@pytest.fixture(scope="module")
def engine_and_params():
    cfg = EngineConfig().tiny()
    engine = VistaEngine(cfg)
    params = engine.init_params(jax.random.key(0), 64, 64)
    return engine, params


def _sampling_inputs(engine, height=64, width=64, seed=1):
    cfg = engine.cfg
    t = cfg.num_frames
    f = cfg.vae.downsample_factor
    hl, wl = height // f, width // f
    zc = cfg.vae.z_channels
    rng = np.random.RandomState(seed)
    noise = jnp.asarray(rng.randn(t, hl, wl, zc), jnp.float32)
    cond_frame = jnp.asarray(rng.randn(1, hl, wl, zc), jnp.float32)
    concat = jnp.concatenate([cond_frame] + [jnp.zeros_like(cond_frame)] * (t - 1), 0)
    ctx = jnp.asarray(rng.randn(1, 1, cfg.unet.context_dim), jnp.float32)
    y = jnp.asarray(rng.randn(1, cfg.unet.adm_in_channels), jnp.float32)
    cond = {"concat": concat, "crossattn": ctx, "vector": y}
    uc = {"concat": concat, "crossattn": jnp.zeros_like(ctx), "vector": jnp.zeros_like(y)}
    cond_frame_b = jnp.concatenate([cond_frame] * t, 0)
    cond_mask = jnp.asarray([1.0] + [0.0] * (t - 1), jnp.float32)
    return noise, cond, uc, cond_frame_b, cond_mask


class TestShardedSampling:
    def test_matches_single_device(self, mesh, engine_and_params):
        engine, params = engine_and_params
        sampler = SamplerConfig(
            num_steps=2, guider=GuiderConfig(kind="triangle", scale=2.0,
                                             num_frames=engine.cfg.num_frames))
        noise, cond, uc, cf, cm = _sampling_inputs(engine)

        ref = engine.jit_sample(sampler)(params, noise, cond, uc, cf, cm)
        sharded_fn = engine.jit_sample_sharded(sampler, mesh)
        out = sharded_fn(params, noise, cond, uc, cf, cm)

        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_output_is_frame_sharded(self, mesh, engine_and_params):
        engine, params = engine_and_params
        sampler = SamplerConfig(num_steps=1, guider=GuiderConfig(kind="identity"))
        noise, cond, uc, cf, cm = _sampling_inputs(engine, seed=2)
        out = engine.jit_sample_sharded(sampler, mesh)(
            params, noise, cond, None, cf, cm)
        spec = out.sharding.spec
        assert spec and spec[0] == "data", spec

    def test_height_sharded_matches(self, mesh, engine_and_params):
        """mode="height": the sequence-parallel layout (latent rows sharded,
        conv halos + attention K/V gathers inserted by GSPMD) is exact."""
        engine, params = engine_and_params
        sampler = SamplerConfig(
            num_steps=2, guider=GuiderConfig(kind="triangle", scale=2.0,
                                             num_frames=engine.cfg.num_frames))
        noise, cond, uc, cf, cm = _sampling_inputs(engine, seed=3)

        ref = engine.jit_sample(sampler)(params, noise, cond, uc, cf, cm)
        out = engine.jit_sample_sharded(sampler, mesh, mode="height")(
            params, noise, cond, uc, cf, cm)

        assert out.shape == ref.shape
        spec = out.sharding.spec
        assert len(spec) > 1 and spec[1] == "data", spec
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_weight_sharded_matches(self, mesh, engine_and_params):
        """mode="weights": ZeRO-style sharded parameters (GSPMD all-gathers
        each layer's weights) produce the single-device latents."""
        engine, params = engine_and_params
        sampler = SamplerConfig(
            num_steps=2, guider=GuiderConfig(kind="triangle", scale=2.0,
                                             num_frames=engine.cfg.num_frames))
        noise, cond, uc, cf, cm = _sampling_inputs(engine, seed=4)

        ref = engine.jit_sample(sampler)(params, noise, cond, uc, cf, cm)
        out = engine.jit_sample_sharded(sampler, mesh, mode="weights",
                                        fsdp_min_size=128)(
            params, noise, cond, uc, cf, cm)

        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_program_cached_across_calls(self, mesh, engine_and_params):
        engine, params = engine_and_params
        sampler = SamplerConfig(num_steps=1, guider=GuiderConfig(kind="identity"))
        f1 = engine.jit_sample_sharded(sampler, mesh)
        f2 = engine.jit_sample_sharded(sampler, mesh)
        assert f1 is f2


@pytest.fixture(scope="module")
def pallas_engine_and_params():
    """Tiny engine with the Pallas kernel stack FORCED on (interpret mode on
    CPU) and the fused GN+conv3 path enabled, so the sharded program
    exercises the shard_map kernel islands end-to-end."""
    import vista_tpu.ops.temporal_conv as tc

    prev = tc._FUSED_GN_ON_CPU
    tc._FUSED_GN_ON_CPU = True
    cfg = EngineConfig().tiny()
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, attn_backend="pallas"))
    engine = VistaEngine(cfg)
    params = engine.init_params(jax.random.key(0), 64, 64)
    yield engine, params
    tc._FUSED_GN_ON_CPU = prev


class TestShardedSamplingPallas:
    """The round-4 verdict's top item: multi-chip programs must keep the
    Pallas kernel stack (shard_map islands), not fall back to XLA attention.
    Exactness is pinned against the single-device Pallas program."""

    def test_pallas_frames_matches_single_device(self, mesh, pallas_engine_and_params):
        from vista_tpu.parallel.kernel_sharding import island_counter

        engine, params = pallas_engine_and_params
        sampler = SamplerConfig(
            num_steps=2, guider=GuiderConfig(kind="triangle", scale=2.0,
                                             num_frames=engine.cfg.num_frames))
        noise, cond, uc, cf, cm = _sampling_inputs(engine, seed=5)

        ref = engine.jit_sample(sampler)(params, noise, cond, uc, cf, cm)
        before = island_counter[0]
        out = engine.jit_sample_sharded(sampler, mesh)(params, noise, cond, uc, cf, cm)
        assert island_counter[0] > before, (
            "no shard_map kernel islands were created — the sharded trace "
            "fell back to GSPMD-replicated kernels")
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-4, rtol=1e-4)

    def test_pallas_train_step_matches_single_device(self, mesh, pallas_engine_and_params):
        """Sharded training step (kernel islands active) == single-device:
        loss AND the updated parameter pytree."""
        from vista_tpu.diffusion.loss import LossConfig
        from vista_tpu.engine.training import TrainConfig, create_train_state, make_train_step
        from vista_tpu.parallel import batch_sharding, kernel_sharding

        engine, params = pallas_engine_and_params
        t = engine.cfg.num_frames
        tcfg = TrainConfig(learning_rate=1e-4, loss=LossConfig(num_frames=t))
        state, tx = create_train_state(tcfg, params)
        step = make_train_step(engine, tcfg, tx)
        frozen = {k: v for k, v in params.items() if k != "unet"}

        n = mesh.shape["data"]
        rng = np.random.RandomState(11)
        batch = {
            "frames": jnp.asarray(rng.randn(n, t, 64, 64, 3) * 0.3, jnp.float32),
            "fps_id": jnp.full((n,), 9.0),
            "motion_bucket_id": jnp.full((n,), 127.0),
            "cond_aug": jnp.zeros((n,)),
        }
        key = jax.random.key(3)

        ref_state, ref_metrics = jax.jit(step)(state, frozen, batch, key)

        sh_batch = jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
        with kernel_sharding(mesh, ("data",)):
            got_state, got_metrics = jax.jit(step)(state, frozen, sh_batch, key)

        np.testing.assert_allclose(float(got_metrics["loss"]),
                                   float(ref_metrics["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(ref_state.unet_params),
                        jax.tree.leaves(got_state.unet_params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=1e-5, rtol=1e-5)


class TestShardedRollout:
    def test_rollout_with_mesh_matches(self, mesh, engine_and_params):
        """autoregressive_rollout(mesh=...) == single-device rollout."""
        from vista_tpu.engine.rollout import RolloutConfig, autoregressive_rollout

        engine, params = engine_and_params
        t = engine.cfg.num_frames
        rng = np.random.RandomState(7)
        images = jnp.asarray(rng.randn(t, 64, 64, 3) * 0.2, jnp.float32)
        batch = {"fps_id": jnp.array([9.0]), "motion_bucket_id": jnp.array([127.0]),
                 "cond_aug": jnp.array([0.0])}
        sampler = SamplerConfig(
            num_steps=2, guider=GuiderConfig(kind="triangle", scale=2.0, num_frames=t))
        rollout = RolloutConfig(num_rounds=2)

        _, lat_ref = autoregressive_rollout(
            engine, params, images, batch, sampler, rollout,
            key=jax.random.key(1), decode_output=False)
        _, lat_sh = autoregressive_rollout(
            engine, params, images, batch, sampler, rollout,
            key=jax.random.key(1), decode_output=False, mesh=mesh)
        np.testing.assert_allclose(np.asarray(lat_sh, np.float32),
                                   np.asarray(lat_ref, np.float32),
                                   atol=2e-2, rtol=2e-2)
