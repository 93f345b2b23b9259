"""Shape/dtype/finiteness contracts for the tiny-config VideoUNet."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vista_tpu.models.unet import VideoUNet, VideoUNetConfig


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = VideoUNetConfig(dtype="float32").tiny()
    model = VideoUNet(cfg)
    t_frames = cfg.num_frames
    x = jnp.asarray(np.random.RandomState(0).randn(t_frames, 16, 16, cfg.in_channels), jnp.float32)
    t = jnp.full((t_frames,), 0.5)
    context = jnp.asarray(np.random.RandomState(1).randn(1, 1, cfg.context_dim), jnp.float32)
    y = jnp.asarray(np.random.RandomState(2).randn(1, cfg.adm_in_channels), jnp.float32)
    cond_mask = jnp.array([1.0, 0.0, 0.0, 0.0])
    params = model.init(jax.random.key(0), x, t, context, y, cond_mask, t_frames)
    return cfg, model, params, (x, t, context, y, cond_mask)


class TestVideoUNet:
    def test_forward_shape_finite(self, tiny_setup):
        cfg, model, params, (x, t, context, y, cond_mask) = tiny_setup
        out = model.apply(params, x, t, context, y, cond_mask, cfg.num_frames)
        assert out.shape == (cfg.num_frames, 16, 16, cfg.out_channels)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_zero_init_head_gives_zero_output(self, tiny_setup):
        """conv_out is zero-init, so a fresh model must output exactly zero."""
        cfg, model, params, (x, t, context, y, cond_mask) = tiny_setup
        out = model.apply(params, x, t, context, y, cond_mask, cfg.num_frames)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_cond_mask_changes_output(self, tiny_setup):
        """The dual time-embedding blend must make pinned frames differ."""
        cfg, model, params, (x, t, context, y, cond_mask) = tiny_setup
        # perturb the conv_out kernel so outputs are non-zero
        params = jax.tree.map(lambda p: p + 0.01, params)
        out_masked = model.apply(params, x, t, context, y, cond_mask, cfg.num_frames)
        out_unmasked = model.apply(params, x, t, context, y, jnp.zeros(4), cfg.num_frames)
        # frame 0 differs (mask hits its time embedding), frames 1+ see the
        # same embedding but mix through temporal attention, so just check
        # the overall tensors differ
        assert not np.allclose(np.asarray(out_masked), np.asarray(out_unmasked))

    def test_temporal_chunking_exact(self):
        """Row-chunked temporal block (nn.scan) must equal the direct path."""
        from vista_tpu.models.attention import TemporalTransformerBlock

        t, s, c = 4, 16, 32
        b = 2
        x = jnp.asarray(np.random.RandomState(0).randn(b * t, s, c), jnp.float32)
        tc = jnp.asarray(np.random.RandomState(1).randn(b * s, 1, c), jnp.float32)
        blk_direct = TemporalTransformerBlock(c, 2, 16, context_dim=c, dtype=jnp.float32,
                                              max_rows=10**9)
        blk_chunked = TemporalTransformerBlock(c, 2, 16, context_dim=c, dtype=jnp.float32,
                                               max_rows=8)
        params = blk_direct.init(jax.random.key(0), x, t, tc)
        out_d = blk_direct.apply(params, x, t, tc)
        out_c = blk_chunked.apply(params, x, t, tc)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_c), atol=1e-5)

    def test_remat_matches_plain(self, tiny_setup):
        """remat=True must be numerically identical (just recompute on bwd).

        Also covers selective checkpointing (remat_max_ds): the tiny config
        runs blocks at ds 1 and 2, so remat_max_ds=1 exercises the mixed
        remat/stored path — same outputs, same param tree (checkpoint
        compatibility across remat modes). And the remat POLICY lever
        (remat_policy="names"/"dots": save attention/FF outputs inside
        rematted blocks, recompute the cheap tail) — numerics and param
        tree must be unchanged; only the backward's store/recompute split
        differs.
        """
        import dataclasses
        cfg, model, params, (x, t, context, y, cond_mask) = tiny_setup
        params_p = jax.tree.map(lambda p: p + 0.01, params)
        out_plain = model.apply(params_p, x, t, context, y, cond_mask, cfg.num_frames)

        for kw in ({"remat": True}, {"remat": True, "remat_max_ds": 1},
                   {"remat": True, "remat_policy": "names"},
                   {"remat": True, "remat_policy": "dots"}):
            cfg_r = dataclasses.replace(cfg, **kw)
            model_r = VideoUNet(cfg_r)
            # param tree layout must be identical across remat modes
            init_r = model_r.init(jax.random.key(0), x, t, context, y,
                                  cond_mask, cfg.num_frames)
            assert (jax.tree_util.tree_structure(init_r)
                    == jax.tree_util.tree_structure(params))
            out_remat = model_r.apply(params_p, x, t, context, y, cond_mask,
                                      cfg.num_frames)
            np.testing.assert_allclose(np.asarray(out_plain),
                                       np.asarray(out_remat), atol=1e-5)

            def loss(p):
                return jnp.sum(model_r.apply(
                    p, x, t, context, y, cond_mask, cfg.num_frames) ** 2)

            g = jax.grad(loss)(params_p)
            assert np.isfinite(max(float(jnp.abs(l).max())
                                   for l in jax.tree.leaves(g)))

    def test_action_control_context(self):
        """With action_control, context carries 2432 extra dims routed to K/V adapters."""
        from vista_tpu.models.attention import ACTION_CONTEXT_DIM

        cfg = VideoUNetConfig(dtype="float32", action_control=True).tiny()
        cfg = cfg.__class__(**{**cfg.__dict__, "action_control": True})
        model = VideoUNet(cfg)
        t_frames = cfg.num_frames
        x = jnp.zeros((t_frames, 8, 8, cfg.in_channels))
        t = jnp.full((t_frames,), 0.5)
        context = jnp.ones((1, 1, cfg.context_dim + ACTION_CONTEXT_DIM))
        y = jnp.zeros((1, cfg.adm_in_channels))
        params = model.init(jax.random.key(0), x, t, context, y, None, t_frames)
        out = model.apply(params, x, t, context, y, None, t_frames)
        assert out.shape == (t_frames, 8, 8, cfg.out_channels)

    def test_lora_params_created_zero_effect(self):
        """LoRA adapters exist when add_lora=True and are zero-init (no output change)."""
        cfg = VideoUNetConfig(dtype="float32").tiny()
        cfg_lora = cfg.__class__(**{**cfg.__dict__, "add_lora": True})
        model = VideoUNet(cfg)
        model_lora = VideoUNet(cfg_lora)
        t_frames = cfg.num_frames
        x = jnp.asarray(np.random.RandomState(0).randn(t_frames, 8, 8, cfg.in_channels), jnp.float32)
        t = jnp.full((t_frames,), 0.5)
        context = jnp.asarray(np.random.RandomState(1).randn(1, 1, cfg.context_dim), jnp.float32)
        y = jnp.zeros((1, cfg.adm_in_channels))
        params_lora = model_lora.init(jax.random.key(0), x, t, context, y, None, t_frames)
        flat = jax.tree_util.tree_flatten_with_path(params_lora)[0]
        lora_keys = [jax.tree_util.keystr(k) for k, _ in flat if "adapter" in jax.tree_util.keystr(k)]
        assert lora_keys, "expected LoRA adapter params"
        # up-projections zero-init -> adapters contribute nothing at init
        ups = [v for k, v in flat if "_adapter']['up']" in jax.tree_util.keystr(k)]
        assert ups, "expected adapter up-projections"
        for u in ups:
            np.testing.assert_allclose(np.asarray(u), 0.0)
