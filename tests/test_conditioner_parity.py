"""Conditioner wiring parity: the concat conditioning path vs the reference.

Round-1 review found two wiring bugs that block-level golden parity could
not catch: (a) the concat conditioning was scaled by 0.18215 while the
reference's VideoPredictionEmbedderWithEncoder defaults scale_factor=1.0
(modules.py:456; configs/inference/vista.yaml:69-98 does not override), and
(b) ucg dropout applied to every embedder while the reference trains with
ucg only on the frame (+ action, phase 2) embedders
(configs/training/vista_phase1.yaml:55-113). These tests pin both.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.torch_ref import load_reference
from vista_tpu.engine import EngineConfig, VistaEngine
from vista_tpu.models.conditioner import ConditionerConfig, GeneralConditioner
from vista_tpu.models.vae import VAEConfig
from vista_tpu.utils import torch_import as ti

REF = load_reference()

H = W = 32


def golden_vae_cfg():
    # ch >= 32 so the torch GroupNorm(32, ch) is constructible
    return VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, dtype="float32")


def reference_embedder(cfg: VAEConfig):
    """The reference cond_frames embedder exactly as the shipped inference
    config builds it (configs/inference/vista.yaml:69-98), tiny ddconfig."""
    torch.manual_seed(0)
    return REF.encoders.VideoPredictionEmbedderWithEncoder(
        n_cond_frames=1,
        n_copies=1,
        is_ae=True,
        disable_encoder_autocast=True,
        encoder_config={
            "target": "vwm.models.autoencoder.AutoencoderKLModeOnly",
            "params": {
                "embed_dim": cfg.z_channels,
                "ddconfig": dict(
                    attn_type="vanilla", double_z=cfg.double_z,
                    z_channels=cfg.z_channels, resolution=H,
                    in_channels=cfg.in_channels, out_ch=cfg.out_channels,
                    ch=cfg.ch, ch_mult=list(cfg.ch_mult),
                    num_res_blocks=cfg.num_res_blocks,
                    attn_resolutions=[], dropout=0.0,
                ),
                "loss_config": {"target": "torch.nn.Identity"},
            },
        },
    ).eval()


def tiny_conditioner(vae_cfg: VAEConfig) -> GeneralConditioner:
    cfg = ConditionerConfig().tiny()
    cfg = dataclasses.replace(
        cfg, vae=vae_cfg,
        clip=dataclasses.replace(cfg.clip, dtype="float32"))
    return GeneralConditioner(cfg)


def full_batch(rng, b=2):
    return {
        "cond_frames_without_noise": jnp.asarray(
            rng.randn(b, H, W, 3), jnp.float32),
        "cond_frames": jnp.asarray(rng.randn(b, H, W, 3), jnp.float32),
        "fps_id": jnp.full((b,), 9.0),
        "motion_bucket_id": jnp.full((b,), 127.0),
        "cond_aug": jnp.zeros((b,)),
    }


class TestConcatGoldenParity:
    def test_concat_matches_reference_embedder(self):
        """Same weights, same pixels: our concat == the torch embedder output.

        In particular: UNSCALED (embedder scale_factor=1.0), quant_conv
        applied before the mode, mode = first half of the moments.
        """
        vae_cfg = golden_vae_cfg()
        temb = reference_embedder(vae_cfg)
        sd = {k: v.detach().numpy() for k, v in temb.state_dict().items()}
        # randomize quant_conv away from anything degenerate
        cond = tiny_conditioner(vae_cfg)

        rng = np.random.RandomState(0)
        batch = full_batch(rng)
        params = cond.init(jax.random.key(0), batch)["params"]
        params = dict(params)
        params["cond_frames_encoder"] = ti.apply_key_map(
            sd, ti.vae_encoder_key_map(vae_cfg), "encoder.encoder.", strict=True)
        params["quant_conv"] = ti.apply_key_map(
            sd, ti._conv2d("encoder.quant_conv", "qc"), "", strict=True)["qc"]

        out = cond.apply({"params": params}, batch)
        x = np.asarray(batch["cond_frames"]).transpose(0, 3, 1, 2)
        with torch.no_grad():
            ref = temb(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(out["concat"]).transpose(0, 3, 1, 2), ref,
            atol=2e-4, rtol=2e-3)

    def test_skip_and_encode_paths_agree(self):
        """Rollout consistency: round-1 (encode path) and round-2+
        (skip_encode fed sampler latents / scale_factor) must produce the
        SAME concat tensor for the same underlying frame."""
        cfg = EngineConfig().tiny()
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

        rng = np.random.RandomState(1)
        batch = full_batch(rng, b=1)
        # round-1 path: pixels -> conditioner's encoder (mode) -> concat
        c_enc = engine.conditions(params, batch)

        # round-2 path: the sampler operates on SCALED first-stage latents;
        # the rollout divides by scale_factor before the skip_encode call
        # (engine/rollout.py). Mode-encode the same pixels like the sampler's
        # pinned cond frame would carry them.
        z_scaled = engine.encode_first_stage(params, batch["cond_frames"])
        batch_skip = dict(batch)
        batch_skip["cond_frames"] = z_scaled / cfg.vae.scale_factor
        c_skip = engine.conditions(params, batch_skip, skip_encode=True)

        np.testing.assert_allclose(
            np.asarray(c_enc["concat"]), np.asarray(c_skip["concat"]),
            atol=1e-5, rtol=1e-5)


class TestUcgScope:
    def _conditioner(self, **over):
        cfg = ConditionerConfig().tiny()
        cfg = dataclasses.replace(
            cfg, clip=dataclasses.replace(cfg.clip, dtype="float32"),
            vae=dataclasses.replace(cfg.vae, dtype="float32"), **over)
        return GeneralConditioner(cfg)

    def _run(self, cond, batch, n_keys=24):
        params = cond.init(jax.random.key(0), batch)
        outs = [cond.apply(params, batch, ucg_key=jax.random.key(s))
                for s in range(n_keys)]
        return outs

    def test_scalars_never_dropped_frames_sometimes(self):
        """Phase-1 scope: ucg 0.15 on the two frame embedders ONLY
        (vista_phase1.yaml:55,81); fps/motion/cond_aug stay intact."""
        cond = self._conditioner(ucg_rate=0.15)
        rng = np.random.RandomState(2)
        batch = full_batch(rng, b=4)
        base = cond.apply(cond.init(jax.random.key(0), batch), batch)
        outs = self._run(cond, batch)

        for out in outs:
            # the vector (fps/motion/cond_aug) is never zeroed
            np.testing.assert_array_equal(
                np.asarray(out["vector"]), np.asarray(base["vector"]))
        # the frame embeddings ARE dropped for some (key, sample)
        def some_zero(key):
            return any(
                np.allclose(np.asarray(o[key][i]), 0.0)
                for o in outs for i in range(4))
        assert some_zero("crossattn"), "CLIP embedding never dropped"
        assert some_zero("concat"), "cond_frames latent never dropped"

    def test_actions_dropped_only_when_in_ucg_keys(self):
        """Phase-2 scope adds the five action embedders
        (vista_phase2_stage1.yaml:120-156); phase-1 scope must leave them."""
        rng = np.random.RandomState(3)
        batch = full_batch(rng, b=4)
        batch["command"] = jnp.asarray(rng.randn(4, 1), jnp.float32)

        phase1 = self._conditioner(ucg_rate=0.15, action_control=True)
        outs1 = self._run(phase1, batch, n_keys=12)
        clip_dim = phase1.cfg.clip.output_dim
        cmd_slice = slice(clip_dim, clip_dim + 128)  # command embed region
        ref = np.asarray(outs1[0]["crossattn"][:, :, cmd_slice])
        for o in outs1:
            np.testing.assert_array_equal(
                np.asarray(o["crossattn"][:, :, cmd_slice]), ref)

        phase2 = self._conditioner(
            ucg_rate=0.15, action_control=True,
            ucg_keys=("cond_frames_without_noise", "cond_frames",
                      "command", "trajectory", "speed", "angle", "goal"))
        outs2 = self._run(phase2, batch, n_keys=24)
        dropped = any(
            np.allclose(np.asarray(o["crossattn"][i, :, cmd_slice]), 0.0)
            for o in outs2 for i in range(4))
        assert dropped, "action embedding never dropped under phase-2 scope"
