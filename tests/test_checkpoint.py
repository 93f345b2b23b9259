"""Checkpoint interop: torch-layout export/import roundtrip + Orbax IO."""

import dataclasses

import numpy as np
import jax
import pytest

from vista_tpu.engine import EngineConfig, VistaEngine
from vista_tpu.utils import checkpoint as io


@pytest.fixture(scope="module")
def tiny_engine_params():
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
    params = engine.init_params(jax.random.key(7), 32, 32)
    return cfg, engine, params


def _tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    assert len(fa) == len(fb)
    for k, va in fa:
        np.testing.assert_allclose(np.asarray(va), np.asarray(fb[k]), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(k))


class TestTorchInterop:
    def test_export_import_roundtrip(self, tiny_engine_params):
        cfg, engine, params = tiny_engine_params
        sd = io.export_vista_checkpoint(jax.device_get(params), cfg)
        assert all(isinstance(v, np.ndarray) for v in sd.values())
        # every exported key uses a known reference prefix
        prefixes = (io.UNET_PREFIX, io.ENC_PREFIX, io.DEC_PREFIX, io.CLIP_PREFIX,
                    io.COND_VAE_PREFIX, io.COND_QUANT_PREFIX)
        assert all(k.startswith(prefixes) for k in sd)
        back = io.import_vista_checkpoint(sd, cfg, strict=True)
        _tree_equal(params, back)

    def test_import_covers_all_unet_params(self, tiny_engine_params):
        """Strict import must populate exactly the UNet param tree shape."""
        cfg, engine, params = tiny_engine_params
        sd = io.export_vista_checkpoint(jax.device_get(params), cfg)
        back = io.import_vista_checkpoint(sd, cfg, strict=True)
        orig_paths = {jax.tree_util.keystr(k)
                      for k, _ in jax.tree_util.tree_flatten_with_path(params["unet"])[0]}
        back_paths = {jax.tree_util.keystr(k)
                      for k, _ in jax.tree_util.tree_flatten_with_path(back["unet"])[0]}
        assert orig_paths == back_paths

    def test_svdxt_cond_time_embed_duplication(self, tiny_engine_params):
        """Missing cond_time_stack_embed gets copied from time_embed (SVD-XT init)."""
        cfg, engine, params = tiny_engine_params
        sd = io.export_vista_checkpoint(jax.device_get(params), cfg)
        sd = {k: v for k, v in sd.items() if "cond_time_stack_embed" not in k}
        back = io.import_vista_checkpoint(sd, cfg, strict=True)
        _tree_equal(back["unet"]["cond_time_stack_embed"], back["unet"]["time_embed"])

    def test_deepspeed_prefix_strip(self, tiny_engine_params):
        cfg, engine, params = tiny_engine_params
        sd = io.export_vista_checkpoint(jax.device_get(params), cfg)
        sd = {"_forward_module." + k: v for k, v in sd.items()}
        back = io.import_vista_checkpoint(sd, cfg, strict=True)
        _tree_equal(params["encoder"], back["encoder"])


class TestOrbax:
    def test_save_load_roundtrip(self, tiny_engine_params, tmp_path):
        cfg, engine, params = tiny_engine_params
        path = str(tmp_path / "ckpt")
        io.save_checkpoint(path, jax.device_get(params))
        restored = io.load_checkpoint(path)
        _tree_equal(params, restored)


class TestSafetensors:
    def test_file_roundtrip(self, tiny_engine_params, tmp_path):
        cfg, engine, params = tiny_engine_params
        sd = io.export_vista_checkpoint(jax.device_get(params), cfg)
        path = str(tmp_path / "w.safetensors")
        io.save_safetensors(path, sd)
        loaded = io.load_safetensors(path)
        assert set(loaded) == set(sd)
        back = io.import_vista_checkpoint(loaded, cfg, strict=True)
        _tree_equal(params, back)
