"""Held-out validation loop: the reference's ``trainer.test`` counterpart
(train.py:897-898, vwm/models/diffusion.py:227-230) as periodic val loss in
runner.Trainer — EMA params, no ucg dropout, fixed per-batch keys."""

import csv
import dataclasses
import os

import numpy as np

from vista_tpu.config import load_config
from vista_tpu.data import build_pipeline
from vista_tpu.runner import ExperimentConfig, Trainer

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "tiny_smoke.yaml")


class TestValidationLoop:
    def test_val_rows_logged(self, tmp_path):
        cfg = load_config(ExperimentConfig, [CFG_PATH], [
            f"run.logdir={tmp_path}", "run.max_steps=2", "run.log_every=1",
            "run.val_every=2", "run.val_batches=1",
        ])
        pipeline = build_pipeline(
            dataclasses.replace(cfg.data, batch_size=8, num_threads=1),
            cfg.height, cfg.width, cfg.engine.num_frames, synthetic=True)
        trainer = Trainer(cfg, pipeline)
        assert trainer.val_pipeline is not None
        trainer.fit()

        with open(trainer._metrics_path, newline="") as f:
            rows = list(csv.DictReader(f))
        assert "val_loss" in rows[0], rows[0].keys()
        val_rows = [r for r in rows if r.get("val_loss")]
        train_rows = [r for r in rows if r.get("loss")]
        assert val_rows, "no validation rows in metrics.csv"
        assert train_rows, "no train rows in metrics.csv"
        val_loss = float(val_rows[-1]["val_loss"])
        train_loss = float(train_rows[-1]["loss"])
        assert np.isfinite(val_loss) and val_loss > 0
        # different batches, different keys, EMA weights: the two metrics
        # must not be the same number (guards against logging train loss
        # under the val name)
        assert val_loss != train_loss

    def test_validate_is_deterministic(self, tmp_path):
        cfg = load_config(ExperimentConfig, [CFG_PATH], [
            f"run.logdir={tmp_path}", "run.max_steps=1", "run.log_every=1",
            "run.val_every=1", "run.val_batches=1",
        ])
        pipeline = build_pipeline(
            dataclasses.replace(cfg.data, batch_size=8, num_threads=1),
            cfg.height, cfg.width, cfg.engine.num_frames, synthetic=True)
        trainer = Trainer(cfg, pipeline)
        m1 = trainer.validate()
        m2 = trainer.validate()
        # fixed keys + deterministic val stream -> identical metric
        assert m1["val_loss"] == m2["val_loss"]
