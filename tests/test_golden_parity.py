"""Golden parity: our Flax networks vs the PyTorch reference, same weights.

The reference checkpoint (vista.safetensors) reuses this exact module tree,
so passing these tests means the checkpoint import path is numerically
faithful (SURVEY.md §7 hard part #1). Weights flow torch -> flax through
``vista_tpu.utils.torch_import`` — the same key maps used by the real
checkpoint importer.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.torch_ref import load_reference
from vista_tpu.models.unet import VideoUNet, VideoUNetConfig
from vista_tpu.models.vae import VAEConfig, VAEDecoder, VAEEncoder, VideoVAEDecoder
from vista_tpu.utils import torch_import as ti

REF = load_reference()

T = 4  # frames in the tiny setup
HL = WL = 8  # latent spatial dims


def tiny_flax_unet_cfg(**over):
    base = VideoUNetConfig(dtype="float32").tiny()
    import dataclasses
    return dataclasses.replace(base, **over)


def tiny_torch_unet(cfg: VideoUNetConfig):
    torch.manual_seed(0)
    return REF.video_model.VideoUNet(
        in_channels=cfg.in_channels,
        model_channels=cfg.model_channels,
        out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult),
        num_head_channels=cfg.num_head_channels,
        transformer_depth=cfg.transformer_depth,
        context_dim=cfg.context_dim,
        adm_in_channels=cfg.adm_in_channels,
        num_classes="sequential",
        use_linear_in_transformer=True,
        extra_ff_mix_layer=True,
        use_spatial_context=True,
        merge_strategy="learned_with_images",
        spatial_transformer_attn_type="softmax",
        video_kernel_size=list(cfg.video_kernel),
        add_lora=cfg.add_lora,
        action_control=False,
    ).eval()


def to_flax_unet_params(tmodel, cfg):
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    return ti.apply_key_map(sd, ti.unet_key_map(cfg), "", strict=True)


class TestUNetGoldenParity:
    @pytest.fixture(scope="class")
    def pair(self):
        cfg = tiny_flax_unet_cfg()
        tmodel = tiny_torch_unet(cfg)
        # randomize the zero-init head so parity is non-trivial
        with torch.no_grad():
            for n, p in tmodel.named_parameters():
                if p.abs().sum() == 0:
                    p.add_(torch.randn_like(p) * 0.02)
        params = {"params": to_flax_unet_params(tmodel, cfg)}
        fmodel = VideoUNet(cfg)
        return cfg, tmodel, fmodel, params

    def test_forward_matches(self, pair):
        cfg, tmodel, fmodel, params = pair
        rng = np.random.RandomState(0)
        x = rng.randn(T, cfg.in_channels, HL, WL).astype(np.float32)
        tt = rng.rand(T).astype(np.float32) * 2 - 1
        context = rng.randn(1, 1, cfg.context_dim).astype(np.float32)
        y = rng.randn(1, cfg.adm_in_channels).astype(np.float32)
        cond_mask = np.array([1.0, 0.0, 0.0, 0.0], np.float32)

        with torch.no_grad():
            ref = tmodel(
                torch.from_numpy(x), torch.from_numpy(tt),
                context=torch.from_numpy(context), y=torch.from_numpy(y),
                cond_mask=torch.from_numpy(cond_mask), num_frames=T,
            ).numpy()

        out = fmodel.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(tt),
            jnp.asarray(context), jnp.asarray(y), jnp.asarray(cond_mask), T,
        )
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)

    def test_no_cond_mask_path(self, pair):
        cfg, tmodel, fmodel, params = pair
        rng = np.random.RandomState(1)
        x = rng.randn(T, cfg.in_channels, HL, WL).astype(np.float32)
        tt = np.full((T,), 0.7, np.float32)
        context = rng.randn(1, 1, cfg.context_dim).astype(np.float32)
        y = rng.randn(1, cfg.adm_in_channels).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(
                torch.from_numpy(x), torch.from_numpy(tt),
                context=torch.from_numpy(context), y=torch.from_numpy(y),
                cond_mask=None, num_frames=T,
            ).numpy()
        out = fmodel.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(tt),
            jnp.asarray(context), jnp.asarray(y), None, T,
        )
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def tiny_vae_cfg():
    # ch must be >= 32 so torch GroupNorm(32, ch) is constructible
    return VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, dtype="float32")


def torch_vae_kwargs(cfg):
    return dict(
        ch=cfg.ch, out_ch=cfg.out_channels, ch_mult=list(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks, attn_resolutions=[],
        in_channels=cfg.in_channels, resolution=32, z_channels=cfg.z_channels,
        double_z=cfg.double_z, attn_type="vanilla",
    )


class TestVAEGoldenParity:
    def test_linear_attn_block_matches(self):
        # the make_attn "linear" option (model.py:138-144, attention.py:145-163)
        from vista_tpu.models.vae import VAELinearAttnBlock

        c = 32
        torch.manual_seed(3)
        tblk = REF.vae_model.LinAttnBlock(c).eval()
        sd = {k: v.detach().numpy() for k, v in tblk.state_dict().items()}
        params = {"params": {
            "to_qkv": {"kernel": sd["to_qkv.weight"].transpose(2, 3, 1, 0)},
            "to_out": {"kernel": sd["to_out.weight"].transpose(2, 3, 1, 0),
                       "bias": sd["to_out.bias"]},
        }}
        rng = np.random.RandomState(0)
        x = rng.randn(2, c, 8, 8).astype(np.float32)
        with torch.no_grad():
            ref = tblk(torch.from_numpy(x)).numpy()
        out = VAELinearAttnBlock(dtype=jnp.float32).apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                                   atol=2e-4, rtol=2e-3)

    def test_encoder_matches(self):
        cfg = tiny_vae_cfg()
        torch.manual_seed(1)
        tenc = REF.vae_model.Encoder(**torch_vae_kwargs(cfg)).eval()
        sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
        params = {"params": ti.apply_key_map(sd, ti.vae_encoder_key_map(cfg), "", True)}
        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, 16, 16).astype(np.float32)
        with torch.no_grad():
            ref = tenc(torch.from_numpy(x)).numpy()
        out = VAEEncoder(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                                   atol=2e-4, rtol=2e-3)

    def test_image_decoder_matches(self):
        cfg = tiny_vae_cfg()
        torch.manual_seed(2)
        tdec = REF.vae_model.Decoder(**torch_vae_kwargs(cfg)).eval()
        sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
        params = {"params": ti.apply_key_map(sd, ti.vae_decoder_key_map(cfg, video=False), "", True)}
        rng = np.random.RandomState(0)
        z = rng.randn(2, cfg.z_channels, 8, 8).astype(np.float32)
        with torch.no_grad():
            ref = tdec(torch.from_numpy(z)).numpy()
        out = VAEDecoder(cfg).apply(params, jnp.asarray(z.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                                   atol=2e-4, rtol=2e-3)

    def test_video_decoder_matches(self):
        cfg = tiny_vae_cfg()
        torch.manual_seed(3)
        tdec = REF.temporal_ae.VideoDecoder(
            **torch_vae_kwargs(cfg), video_kernel_size=list(cfg.video_kernel)).eval()
        sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
        params = {"params": ti.apply_key_map(sd, ti.vae_decoder_key_map(cfg, video=True), "", True)}
        rng = np.random.RandomState(0)
        z = rng.randn(T, cfg.z_channels, 8, 8).astype(np.float32)
        with torch.no_grad():
            ref = tdec(torch.from_numpy(z), timesteps=T).numpy()
        out = VideoVAEDecoder(cfg).apply(params, jnp.asarray(z.transpose(0, 2, 3, 1)), T)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                                   atol=5e-4, rtol=2e-3)


class TestUNetLoRAActionParity:
    """Golden parity for the finetuning paths: LoRA adapters on q/k/v/out and
    action-control K/V adapters (+2432 context dims), vs the reference
    MemoryEfficientCrossAttention (attention.py:294-353) — the impl the
    released LoRA-merged, action-controlled Vista weights run through."""

    ACTION_DIM = 128 * 19

    @pytest.fixture(scope="class")
    def pair(self):
        cfg = tiny_flax_unet_cfg(add_lora=True, action_control=True)
        torch.manual_seed(4)
        tmodel = REF.video_model.VideoUNet(
            in_channels=cfg.in_channels,
            model_channels=cfg.model_channels,
            out_channels=cfg.out_channels,
            num_res_blocks=cfg.num_res_blocks,
            attention_resolutions=list(cfg.attention_resolutions),
            channel_mult=list(cfg.channel_mult),
            num_head_channels=cfg.num_head_channels,
            transformer_depth=cfg.transformer_depth,
            context_dim=cfg.context_dim,
            adm_in_channels=cfg.adm_in_channels,
            num_classes="sequential",
            use_linear_in_transformer=True,
            extra_ff_mix_layer=True,
            use_spatial_context=True,
            merge_strategy="learned_with_images",
            spatial_transformer_attn_type="softmax-xformers",
            video_kernel_size=list(cfg.video_kernel),
            add_lora=cfg.add_lora,
            action_control=True,
        ).eval()
        # randomize every zero-init tensor (LoRA ups, action adapters, zero
        # heads) so the adapter paths actually contribute to the output
        with torch.no_grad():
            for n, p in tmodel.named_parameters():
                if p.abs().sum() == 0:
                    p.add_(torch.randn_like(p) * 0.02)
        params = {"params": to_flax_unet_params(tmodel, cfg)}
        return cfg, tmodel, VideoUNet(cfg), params

    def _inputs(self, cfg, seed=0):
        rng = np.random.RandomState(seed)
        x = rng.randn(T, cfg.in_channels, HL, WL).astype(np.float32)
        tt = rng.rand(T).astype(np.float32) * 2 - 1
        context = rng.randn(1, 1, cfg.context_dim + self.ACTION_DIM).astype(np.float32)
        y = rng.randn(1, cfg.adm_in_channels).astype(np.float32)
        cond_mask = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
        return x, tt, context, y, cond_mask

    def test_forward_matches(self, pair):
        cfg, tmodel, fmodel, params = pair
        x, tt, context, y, cond_mask = self._inputs(cfg)
        with torch.no_grad():
            ref = tmodel(
                torch.from_numpy(x), torch.from_numpy(tt),
                context=torch.from_numpy(context), y=torch.from_numpy(y),
                cond_mask=torch.from_numpy(cond_mask), num_frames=T,
            ).numpy()
        out = fmodel.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(tt),
            jnp.asarray(context), jnp.asarray(y), jnp.asarray(cond_mask), T,
        )
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)

    def test_action_dims_change_output(self, pair):
        """The action slice of the context must flow through the K/V
        adapters: zeroing it changes the output (adapters were randomized)."""
        cfg, tmodel, fmodel, params = pair
        x, tt, context, y, cond_mask = self._inputs(cfg)
        out = fmodel.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(tt),
            jnp.asarray(context), jnp.asarray(y), jnp.asarray(cond_mask), T)
        ctx0 = context.copy()
        ctx0[..., cfg.context_dim:] = 0.0
        out0 = fmodel.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(tt),
            jnp.asarray(ctx0), jnp.asarray(y), jnp.asarray(cond_mask), T)
        assert not np.allclose(np.asarray(out), np.asarray(out0), atol=1e-5)

    def test_lora_merge_roundtrip(self, pair):
        """merge_lora_weights folds the adapters into base weights: the
        merged no-LoRA flax model must equal the torch model running its
        adapters live (W x + up(down(x)) == (W + up@down) x)."""
        from vista_tpu.utils.checkpoint import merge_lora_weights

        cfg, tmodel, fmodel, params = pair
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        merged = merge_lora_weights(sd)
        assert not any("adapter_down" in k or "adapter_up" in k for k in merged)
        import dataclasses as _dc

        cfg_nl = _dc.replace(cfg, add_lora=False)
        params_nl = {"params": ti.apply_key_map(
            merged, ti.unet_key_map(cfg_nl), "", strict=True)}
        x, tt, context, y, cond_mask = self._inputs(cfg, seed=5)
        with torch.no_grad():
            ref = tmodel(
                torch.from_numpy(x), torch.from_numpy(tt),
                context=torch.from_numpy(context), y=torch.from_numpy(y),
                cond_mask=torch.from_numpy(cond_mask), num_frames=T,
            ).numpy()
        out = VideoUNet(cfg_nl).apply(
            params_nl, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(tt),
            jnp.asarray(context), jnp.asarray(y), jnp.asarray(cond_mask), T,
        )
        out = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)
