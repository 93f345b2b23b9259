"""Config system, data pipeline, interop key-map, and media-writer tests."""

import json
import os

import numpy as np
import pytest

from vista_tpu.config import apply_overrides, from_dict, load_config, save_config, to_dict
from vista_tpu.data import (
    DataPipeline,
    DatasetConfig,
    MultiSourceSampler,
    PipelineConfig,
    SyntheticVideoDataset,
)
from vista_tpu.data.datasets import center_crop_resize
from vista_tpu.runner import ExperimentConfig


class TestConfig:
    def test_roundtrip(self, tmp_path):
        cfg = ExperimentConfig()
        path = tmp_path / "c.yaml"
        save_config(cfg, str(path))
        loaded = load_config(ExperimentConfig, [str(path)])
        assert loaded == cfg

    def test_overrides_and_merge(self, tmp_path):
        import yaml

        p1 = tmp_path / "a.yaml"
        p2 = tmp_path / "b.yaml"
        p1.write_text(yaml.safe_dump({"height": 320, "train": {"learning_rate": 1e-5}}))
        p2.write_text(yaml.safe_dump({"height": 576}))
        cfg = load_config(ExperimentConfig, [str(p1), str(p2)],
                          ["train.grad_clip=0.5", "engine.num_frames=10"])
        assert cfg.height == 576  # later file wins
        assert cfg.train.learning_rate == 1e-5
        assert cfg.train.grad_clip == 0.5
        assert cfg.engine.num_frames == 10

    def test_unknown_key_rejected(self):
        with pytest.raises(KeyError):
            from_dict(ExperimentConfig, {"no_such_key": 1})

    def test_nested_tuple_conversion(self):
        cfg = from_dict(ExperimentConfig, {"engine": {"unet": {"channel_mult": [1, 2]}}})
        assert cfg.engine.unet.channel_mult == (1, 2)

    def test_all_shipped_configs_parse(self):
        import glob

        paths = sorted(glob.glob(os.path.join(
            os.path.dirname(__file__), "..", "configs", "*.yaml")))
        assert len(paths) >= 5
        for p in paths:
            cfg = load_config(ExperimentConfig, [p])
            assert cfg.engine.num_frames > 0
            assert cfg.train.learning_rate > 0


class TestData:
    def test_center_crop_resize_geometry(self):
        img = np.zeros((100, 300, 3), np.uint8)
        out = center_crop_resize(img, 32, 64)
        assert out.shape == (32, 64, 3)
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_synthetic_dataset_contract(self):
        ds = SyntheticVideoDataset(DatasetConfig(height=16, width=16, num_frames=4), length=8)
        s = ds[0]
        assert s["frames"].shape == (4, 16, 16, 3)
        assert s["fps_id"] == 9.0
        # deterministic
        np.testing.assert_array_equal(ds[3]["frames"], ds[3]["frames"])

    def test_multi_source_retry_bounded(self):
        class Broken:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise IOError("corrupt")

        s = MultiSourceSampler([Broken()], samples_per_epoch=10, max_retries=5)
        with pytest.raises(RuntimeError, match="sample failures"):
            s.sample()
        assert s.error_count == 5

    def test_pipeline_batches(self):
        ds = SyntheticVideoDataset(DatasetConfig(height=8, width=8, num_frames=2), length=8)
        sampler = MultiSourceSampler([ds], samples_per_epoch=8)
        pipe = DataPipeline(sampler, PipelineConfig(batch_size=2, prefetch=2, num_threads=2))
        batches = list(pipe)
        pipe.stop()
        assert len(batches) == 4
        assert batches[0]["frames"].shape == (2, 2, 8, 8, 3)

    def test_weighted_sources(self):
        a = SyntheticVideoDataset(DatasetConfig(height=4, width=4, num_frames=1), length=2)
        b = SyntheticVideoDataset(DatasetConfig(height=4, width=4, num_frames=1, fps_id=5.0),
                                  length=2)
        s = MultiSourceSampler([a, b], probs=[0.9, 0.1], samples_per_epoch=100, seed=0)
        fps = [float(s.sample()["fps_id"]) for _ in range(200)]
        frac_a = sum(1 for f in fps if f == 9.0) / len(fps)
        assert frac_a > 0.75


class TestMediaWriters:
    def test_grid_and_video(self, tmp_path):
        from vista_tpu.utils.video import save_frames_png, save_grid_png, save_video_mp4

        frames = np.random.rand(5, 16, 16, 3).astype(np.float32)
        save_grid_png(str(tmp_path / "g.png"), frames)
        save_frames_png(str(tmp_path / "frames"), frames)
        assert (tmp_path / "g.png").exists()
        assert len(os.listdir(tmp_path / "frames")) == 5
        try:
            save_video_mp4(str(tmp_path / "v.mp4"), frames)
            assert (tmp_path / "v.mp4").stat().st_size > 0
        except Exception:
            pytest.skip("no ffmpeg backend available")


class TestLoRAMerge:
    def test_merge_lora_weights(self):
        from vista_tpu.utils.checkpoint import merge_lora_weights

        rng = np.random.RandomState(0)
        w = rng.randn(8, 8).astype(np.float32)
        down = rng.randn(2, 8).astype(np.float32)
        up = rng.randn(8, 2).astype(np.float32)
        sd = {
            "blocks.0.attn1.to_q.weight": w.copy(),
            "blocks.0.attn1.q_adapter_down.weight": down,
            "blocks.0.attn1.q_adapter_up.weight": up,
        }
        out = merge_lora_weights(sd)
        np.testing.assert_allclose(out["blocks.0.attn1.to_q.weight"], w + up @ down, rtol=1e-6)
        assert "blocks.0.attn1.q_adapter_down.weight" not in out

    def test_merge_out_adapter(self):
        from vista_tpu.utils.checkpoint import merge_lora_weights

        rng = np.random.RandomState(1)
        w = rng.randn(8, 8).astype(np.float32)
        down = rng.randn(2, 8).astype(np.float32)
        up = rng.randn(8, 2).astype(np.float32)
        sd = {
            "blocks.0.attn2.to_out.0.weight": w.copy(),
            "blocks.0.attn2.out_adapter_down.weight": down,
            "blocks.0.attn2.out_adapter_up.weight": up,
        }
        out = merge_lora_weights(sd)
        np.testing.assert_allclose(out["blocks.0.attn2.to_out.0.weight"], w + up @ down, rtol=1e-6)
