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


class TestCLIPGoldenParity:
    """Parity against HuggingFace's independent CLIP implementation.

    open_clip is not installed in this environment, so the ViT-H trunk is
    validated against transformers' CLIPVisionModelWithProjection — the same
    architecture (laion/CLIP-ViT-H-14 ships in this layout on HF). The HF
    state dict is first RENAMED INTO THE open_clip LAYOUT and pushed through
    ``torch_import.clip_key_map`` — the exact importer path used for
    vista.safetensors — so a wrong transpose or LN placement in either the
    module or the key map fails this test.
    """

    def _hf_model(self, cfg):
        import pytest

        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")

        hf_cfg = transformers.CLIPVisionConfig(
            hidden_size=cfg.width,
            intermediate_size=cfg.width * 4,
            num_hidden_layers=cfg.layers,
            num_attention_heads=cfg.heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            projection_dim=cfg.output_dim,
            hidden_act="gelu",          # laion2b ViT-H uses exact GELU
            layer_norm_eps=1e-5,
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
        return torch, model

    def _to_open_clip_sd(self, torch, model, numpy=True):
        """HF names -> open_clip visual-tower names (modules.py:251-399).

        ``numpy=False`` returns torch tensors instead — usable with
        meta-device models for structural (shape-only) audits
        (tests/test_full_scale_keymap.py)."""
        sd = model.state_dict()
        out = {}
        out["conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
        out["class_embedding"] = sd["vision_model.embeddings.class_embedding"]
        out["positional_embedding"] = sd[
            "vision_model.embeddings.position_embedding.weight"]
        out["ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
        out["ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
        n_layers = model.config.num_hidden_layers
        for i in range(n_layers):
            h = f"vision_model.encoder.layers.{i}"
            o = f"transformer.resblocks.{i}"
            out[f"{o}.attn.in_proj_weight"] = torch.cat(
                [sd[f"{h}.self_attn.q_proj.weight"],
                 sd[f"{h}.self_attn.k_proj.weight"],
                 sd[f"{h}.self_attn.v_proj.weight"]], dim=0)
            out[f"{o}.attn.in_proj_bias"] = torch.cat(
                [sd[f"{h}.self_attn.q_proj.bias"],
                 sd[f"{h}.self_attn.k_proj.bias"],
                 sd[f"{h}.self_attn.v_proj.bias"]], dim=0)
            out[f"{o}.attn.out_proj.weight"] = sd[f"{h}.self_attn.out_proj.weight"]
            out[f"{o}.attn.out_proj.bias"] = sd[f"{h}.self_attn.out_proj.bias"]
            out[f"{o}.ln_1.weight"] = sd[f"{h}.layer_norm1.weight"]
            out[f"{o}.ln_1.bias"] = sd[f"{h}.layer_norm1.bias"]
            out[f"{o}.ln_2.weight"] = sd[f"{h}.layer_norm2.weight"]
            out[f"{o}.ln_2.bias"] = sd[f"{h}.layer_norm2.bias"]
            out[f"{o}.mlp.c_fc.weight"] = sd[f"{h}.mlp.fc1.weight"]
            out[f"{o}.mlp.c_fc.bias"] = sd[f"{h}.mlp.fc1.bias"]
            out[f"{o}.mlp.c_proj.weight"] = sd[f"{h}.mlp.fc2.weight"]
            out[f"{o}.mlp.c_proj.bias"] = sd[f"{h}.mlp.fc2.bias"]
        out["ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
        out["ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
        # open_clip stores proj as (width, out) used as x @ proj
        out["proj"] = sd["visual_projection.weight"].t().contiguous()
        if not numpy:
            return out
        return {k: v.detach().numpy() for k, v in out.items()}

    def test_tower_matches_hf_clip(self):
        import torch as _  # noqa: F401 - skip cleanly when torch missing

        from vista_tpu.utils import torch_import as ti

        cfg = CLIPVisionConfig(dtype="float32").tiny()
        torch, model = self._hf_model(cfg)
        sd = self._to_open_clip_sd(torch, model)
        params = {"params": ti.apply_key_map(sd, ti.clip_key_map(cfg), "", strict=True)}

        rng = np.random.RandomState(1)
        x = rng.randn(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
        with torch.no_grad():
            ref = model(pixel_values=torch.from_numpy(
                x.transpose(0, 3, 1, 2))).image_embeds.numpy()
        out = CLIPVisionTower(cfg).apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)


class TestCLIPTextGoldenParity:
    """Text trunk (FrozenCLIPEmbedder counterpart, modules.py:183-248) vs
    HF CLIPTextModel — last_hidden_state and EOT-pooled output."""

    def test_text_tower_matches_hf(self):
        import pytest

        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")

        from vista_tpu.models.clip import CLIPTextConfig, CLIPTextTower
        from vista_tpu.utils import torch_import as ti

        cfg = CLIPTextConfig(dtype="float32").tiny()
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.width,
            intermediate_size=cfg.width * 4,
            num_hidden_layers=cfg.layers,
            num_attention_heads=cfg.heads,
            max_position_embeddings=cfg.max_length,
            hidden_act="quick_gelu",
            layer_norm_eps=1e-5,
            eos_token_id=cfg.vocab_size - 1,
        )
        torch.manual_seed(0)
        model = transformers.CLIPTextModel(hf_cfg).eval()

        params = {"params": ti.import_hf_clip_text(
            {k: v.numpy() for k, v in model.state_dict().items()}, cfg)}

        rng = np.random.RandomState(0)
        tokens = rng.randint(1, cfg.vocab_size - 1, (2, cfg.max_length))
        tokens[:, 5] = cfg.vocab_size - 1  # EOT (largest id) mid-sequence
        with torch.no_grad():
            out = model(input_ids=torch.from_numpy(tokens))
            ref_h = out.last_hidden_state.numpy()
            ref_p = out.pooler_output.numpy()

        hidden, pooled = CLIPTextTower(cfg).apply(params, jnp.asarray(tokens))
        np.testing.assert_allclose(np.asarray(hidden), ref_h, atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(pooled), ref_p, atol=2e-4, rtol=2e-3)
