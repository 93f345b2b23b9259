"""Trainer-level SPMD + real-data wiring (VERDICT round-1 items 3/4).

Round 1 had SPMD only in a standalone test and the dryrun; the Trainer
itself ran single-device and the CLI could only reach synthetic data. These
tests pin the first-class path: Trainer builds the mesh, shards the batch
over ``data`` and the TrainState over ``fsdp``, and the typed ``data:``
config constructs nuScenes-format sources end-to-end.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax

from vista_tpu.config import load_config
from vista_tpu.data import DataConfig, SourceConfig, build_pipeline
from vista_tpu.runner import ExperimentConfig, Trainer

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "tiny_smoke.yaml")


class TestTrainerSPMD:
    @pytest.fixture(scope="class")
    def trainer(self, tmp_path_factory):
        logdir = tmp_path_factory.mktemp("spmd_run")
        cfg = load_config(ExperimentConfig, [CFG_PATH], [
            f"run.logdir={logdir}", "run.max_steps=2", "run.log_every=1",
            "parallel.data=4", "parallel.fsdp=2",
        ])
        pipeline = build_pipeline(
            dataclasses.replace(cfg.data, batch_size=4, num_threads=2),
            cfg.height, cfg.width, cfg.engine.num_frames, synthetic=True)
        return Trainer(cfg, pipeline)

    def test_mesh_and_state_sharding(self, trainer):
        assert dict(trainer.mesh.shape) == {"data": 4, "fsdp": 2}
        # at least one large UNet leaf must actually be sharded over fsdp
        sharded = [
            leaf for leaf in jax.tree.leaves(trainer.state.unet_params)
            if not leaf.sharding.is_fully_replicated
        ]
        assert sharded, "no unet parameter is fsdp-sharded"
        # frozen towers are replicated
        for leaf in jax.tree.leaves(trainer.frozen):
            assert leaf.sharding.is_fully_replicated

    def test_fit_runs_sharded(self, trainer):
        state = trainer.fit()
        assert int(state.step) == 2
        metrics = open(trainer._metrics_path).read().splitlines()
        assert len(metrics) >= 2  # header + at least one row
        loss = float(metrics[1].split(",")[1])
        assert np.isfinite(loss)

    def test_image_log_panels_written(self, trainer):
        # fit() above hit the power-of-2 early log schedule at step 1; the
        # three reference panels must all exist: input, sampled rollout, and
        # the VAE round-trip "targets" panel (reference diffusion.py:364-365).
        # log_images swallows exceptions by design, so a broken panel path
        # would otherwise pass silently.
        img_dir = os.path.join(trainer.cfg.run.logdir, "images")
        files = os.listdir(img_dir)
        for prefix in ("input_", "sample_", "recon_"):
            assert any(f.startswith(prefix) for f in files), (prefix, files)

    def test_batch_is_data_sharded(self, trainer):
        batch = {"frames": np.zeros((4, 2, 8, 8, 3), np.float32),
                 "fps_id": np.zeros((4,), np.float32)}
        dev = trainer._put_batch(batch)
        spec = dev["frames"].sharding.spec
        assert spec and spec[0] == "data"


class TestNuScenesDataWiring:
    @pytest.fixture()
    def nusc_root(self, tmp_path):
        """A nuScenes-format annotation file + frame images on disk."""
        from PIL import Image

        root = tmp_path / "nusc"
        root.mkdir()
        rng = np.random.RandomState(0)
        annos = []
        for s in range(3):
            frames = []
            for i in range(4):
                rel = f"sweep_{s}/frame_{i}.png"
                (root / f"sweep_{s}").mkdir(exist_ok=True)
                Image.fromarray(
                    rng.randint(0, 255, (40, 64, 3), np.uint8)).save(root / rel)
                frames.append(rel)
            annos.append({
                "frames": frames,
                "traj": list(np.linspace(0, 1, 12)),
                "cmd": 2,
                "speed": [0.0, 1.0, 2.0, 3.0, 4.0],
                "angle": [0.0, 10.0, 20.0, 30.0, 40.0],
                "z": 1.0,
                "goal": [800.0, 450.0],
            })
        anno_file = tmp_path / "nusc_train.json"
        anno_file.write_text(json.dumps(annos))
        return str(anno_file), str(root)

    def test_build_pipeline_nuscenes_batches(self, nusc_root):
        anno_file, root = nusc_root
        # batch_size=1 like every shipped reference config: the cycling
        # action_mod makes action keys RAGGED across samples, so any larger
        # batch would drop them in collation (the reference's torch
        # default_collate would crash outright)
        cfg = DataConfig(
            sources=(SourceConfig(kind="nuscenes", anno_file=anno_file,
                                  data_root=root),),
            batch_size=1, num_threads=1, samples_per_epoch=8)
        pipe = build_pipeline(cfg, height=32, width=64, num_frames=4)
        batches = list(pipe)
        pipe.stop()
        assert len(batches) == 8
        action_keys = {"trajectory", "command", "speed", "angle", "goal"}
        seen_actions = set()
        for b in batches:
            assert b["frames"].shape == (1, 4, 32, 64, 3)
            assert b["frames"].min() >= -1.0 and b["frames"].max() <= 1.0
            assert b["fps_id"].shape == (1,)
            seen_actions |= action_keys & set(b.keys())
        # the cycling action_mod yields multiple modalities across batches
        assert len(seen_actions) >= 2, f"only {seen_actions} emitted"

    def test_process_index_decorrelates_streams(self, nusc_root):
        # multi-host DP: each host must draw a distinct part of the global
        # batch; identical per-process seeds would duplicate samples
        anno_file, root = nusc_root
        cfg = DataConfig(
            sources=(SourceConfig(kind="nuscenes", anno_file=anno_file,
                                  data_root=root),),
            batch_size=1, num_threads=1, samples_per_epoch=16)

        def stream(pidx):
            pipe = build_pipeline(cfg, height=32, width=64, num_frames=4,
                                  process_index=pidx)
            out = [b["frames"] for b in pipe]
            pipe.stop()
            return out

        a0, a0b, a1 = stream(0), stream(0), stream(1)
        for x, y in zip(a0, a0b):  # same process index -> deterministic
            np.testing.assert_array_equal(x, y)
        assert any(x.shape != y.shape or not np.array_equal(x, y)
                   for x, y in zip(a0, a1)), "process 0 and 1 drew identical data"

    def test_unknown_source_kind_rejected(self):
        cfg = DataConfig(sources=(SourceConfig(kind="nope"),))
        with pytest.raises(ValueError):
            build_pipeline(cfg, 32, 64, 4)

    def test_missing_anno_rejected(self, tmp_path):
        cfg = DataConfig(sources=(SourceConfig(
            kind="nuscenes", anno_file=str(tmp_path / "missing.json")),))
        with pytest.raises(FileNotFoundError):
            build_pipeline(cfg, 32, 64, 4)


class TestThreadSafeSamplerRNG:
    def test_concurrent_sampling_distinct_streams(self):
        import threading

        from vista_tpu.data import DatasetConfig, MultiSourceSampler, SyntheticVideoDataset

        ds = SyntheticVideoDataset(
            DatasetConfig(height=8, width=8, num_frames=2), length=1000)
        sampler = MultiSourceSampler([ds], samples_per_epoch=100, seed=0)
        results = {}

        def work(tid):
            vals = [float(sampler.sample()["frames"].sum()) for _ in range(20)]
            results[tid] = vals

        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        # four distinct streams: no two threads drew the identical sequence
        seqs = [tuple(v) for v in results.values()]
        assert len(set(seqs)) == 4
