"""Full-scale checkpoint key-map audit (round-4 verdict, Missing #1).

The golden-parity tests pin NUMERICS at ``.tiny()`` scale; this audit pins
STRUCTURE at the shipped 1.5 B scale, where the level-2/3, ds8 and
1280-channel paths of the key maps were previously never compared against
the real torch module tree. No checkpoint or memory is needed:

- reference side: the torch modules are instantiated on the ``meta`` device
  (parameters carry shapes, no storage) at the exact shipped configs
  (`/root/reference/configs/inference/vista.yaml`, loaded by
  train.py:636-680 / sample_utils.py:54-80);
- our side: ``jax.eval_shape`` of each Flax module's ``init`` yields the
  full param tree (paths + shapes) without allocating;
- assertion: the programmatic key maps cover both trees EXACTLY (no
  missing, no extra, both directions) with transform-consistent shapes.
"""

import dataclasses

import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import numpy as np

from tests.torch_ref import load_reference
from vista_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
from vista_tpu.models.unet import VideoUNet, VideoUNetConfig
from vista_tpu.models.vae import VAEConfig, VAEEncoder, VideoVAEDecoder
from vista_tpu.utils import torch_import as ti

REF = load_reference()


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


def _expected_flax_shape(torch_shape, kind):
    if kind == "linear":
        return tuple(torch_shape)[::-1]
    if kind == "conv2d":
        o, i, h, w = torch_shape
        return (h, w, i, o)
    if kind == "conv3d":
        o, i, t, h, w = torch_shape
        return (t, h, w, i, o)
    return tuple(torch_shape)


def _audit(torch_shapes, entries, flax_shapes):
    """Key map must cover the torch AND flax trees exactly, with
    transform-consistent shapes."""
    tkeys = [e[0] for e in entries]
    assert len(set(tkeys)) == len(tkeys), "duplicate torch keys in map"
    t_missing = sorted(set(torch_shapes) - set(tkeys))
    t_extra = sorted(set(tkeys) - set(torch_shapes))
    assert not t_missing, f"{len(t_missing)} torch keys unmapped, e.g. {t_missing[:5]}"
    assert not t_extra, f"{len(t_extra)} map entries without torch keys, e.g. {t_extra[:5]}"

    fpaths = [e[1] for e in entries]
    assert len(set(fpaths)) == len(fpaths), "duplicate flax paths in map"
    f_missing = sorted(set(flax_shapes) - set(fpaths))
    f_extra = sorted(set(fpaths) - set(flax_shapes))
    assert not f_missing, f"{len(f_missing)} flax params unmapped, e.g. {f_missing[:5]}"
    assert not f_extra, f"{len(f_extra)} map paths without flax params, e.g. {f_extra[:5]}"

    for tkey, fpath, kind in entries:
        want = _expected_flax_shape(torch_shapes[tkey], kind)
        got = flax_shapes[fpath]
        assert got == want, (
            f"shape mismatch {tkey} ({kind}) {torch_shapes[tkey]} -> "
            f"expected flax {want}, tree has {got} at {fpath}")


def _meta_state_shapes(build):
    with torch.device("meta"):
        model = build()
    return {k: tuple(v.shape) for k, v in model.state_dict().items()}


class TestFullScaleUNet:
    def _torch_shapes(self, cfg: VideoUNetConfig):
        return _meta_state_shapes(lambda: REF.video_model.VideoUNet(
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
            # the shipped attn type (vista.yaml:39) — and the only reference
            # attention impl that carries the LoRA / action-control adapters
            # (attention.py:294-353), so the audit must use it
            spatial_transformer_attn_type="softmax-xformers",
            video_kernel_size=list(cfg.video_kernel),
            add_lora=cfg.add_lora,
            action_control=cfg.action_control,
        ))

    def _flax_shapes(self, cfg: VideoUNetConfig):
        unet = VideoUNet(cfg)
        t = cfg.num_frames
        ctx_dim = cfg.context_dim + (128 * 19 if cfg.action_control else 0)
        x = jax.ShapeDtypeStruct((t, 16, 16, cfg.in_channels), jnp.float32)
        sigma = jax.ShapeDtypeStruct((t,), jnp.float32)
        ctx = jax.ShapeDtypeStruct((1, 1, ctx_dim), jnp.float32)
        y = jax.ShapeDtypeStruct((1, cfg.adm_in_channels), jnp.float32)
        cm = jax.ShapeDtypeStruct((t,), jnp.float32)
        shapes = jax.eval_shape(
            lambda k, *a: unet.init(k, *a, t), jax.random.key(0),
            x, sigma, ctx, y, cm)
        return _flatten(shapes["params"])

    def test_inference_config(self):
        """vista.yaml: 320 ch, mult [1,2,4,4], action_control=True."""
        cfg = dataclasses.replace(VideoUNetConfig(dtype="float32"),
                                  action_control=True)
        _audit(self._torch_shapes(cfg), ti.unet_key_map(cfg), self._flax_shapes(cfg))

    def test_phase2_lora_config(self):
        """The finetune tree: LoRA adapters + action control both on."""
        cfg = dataclasses.replace(VideoUNetConfig(dtype="float32"),
                                  action_control=True, add_lora=True)
        _audit(self._torch_shapes(cfg), ti.unet_key_map(cfg), self._flax_shapes(cfg))


class TestFullScaleVAE:
    def _kwargs(self, cfg: VAEConfig):
        return dict(
            ch=cfg.ch, out_ch=cfg.out_channels, ch_mult=list(cfg.ch_mult),
            num_res_blocks=cfg.num_res_blocks, attn_resolutions=[],
            in_channels=cfg.in_channels, resolution=256, z_channels=cfg.z_channels,
            double_z=cfg.double_z, attn_type="vanilla",
        )

    def test_encoder(self):
        cfg = VAEConfig(dtype="float32")
        torch_shapes = _meta_state_shapes(
            lambda: REF.vae_model.Encoder(**self._kwargs(cfg)))
        x = jax.ShapeDtypeStruct((1, 64, 64, cfg.in_channels), jnp.float32)
        shapes = jax.eval_shape(VAEEncoder(cfg).init, jax.random.key(0), x)
        _audit(torch_shapes, ti.vae_encoder_key_map(cfg), _flatten(shapes["params"]))

    def test_video_decoder(self):
        cfg = VAEConfig(dtype="float32")
        torch_shapes = _meta_state_shapes(
            lambda: REF.temporal_ae.VideoDecoder(
                **self._kwargs(cfg), video_kernel_size=list(cfg.video_kernel)))
        z = jax.ShapeDtypeStruct((4, 8, 8, cfg.z_channels), jnp.float32)
        shapes = jax.eval_shape(
            lambda k, z: VideoVAEDecoder(cfg).init(k, z, 4), jax.random.key(0), z)
        _audit(torch_shapes, ti.vae_decoder_key_map(cfg, video=True),
               _flatten(shapes["params"]))


class TestFullScaleCLIP:
    def test_vit_h_tower(self):
        """ViT-H/14 at full width (1280, 32 layers) through the HF->open_clip
        renamer already validated numerically at tiny scale (test_clip.py)."""
        transformers = pytest.importorskip("transformers")
        from tests.test_clip import TestCLIPGoldenParity

        cfg = CLIPVisionConfig(dtype="float32")
        hf_cfg = transformers.CLIPVisionConfig(
            hidden_size=cfg.width, intermediate_size=cfg.width * 4,
            num_hidden_layers=cfg.layers, num_attention_heads=cfg.heads,
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            projection_dim=cfg.output_dim, hidden_act="gelu",
            layer_norm_eps=1e-5, attention_dropout=0.0)
        with torch.device("meta"):
            model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
        sd = TestCLIPGoldenParity._to_open_clip_sd(
            TestCLIPGoldenParity(), torch, model, numpy=False)
        torch_shapes = {k: tuple(v.shape) for k, v in sd.items()}

        x = jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        shapes = jax.eval_shape(CLIPVisionTower(cfg).init, jax.random.key(0), x)
        _audit(torch_shapes, ti.clip_key_map(cfg), _flatten(shapes["params"]))
