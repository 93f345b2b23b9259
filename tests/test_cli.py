"""End-to-end smoke of the CLI entry points (reference: train.py, sample.py,
reward.py argparse surfaces).

Each CLI runs in a subprocess with the tiny config on CPU — the only layer
the rest of the suite does not already cover is exactly this arg-plumbing +
main() wiring, so these tests assert process exit codes and the on-disk
outputs rather than numerics (pinned elsewhere).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=560, env_extra=None):
    # model a plain single-device host: drop the suite's 8-virtual-device
    # XLA_FLAGS (inherited from conftest) and PYTHONPATH (breaks backend
    # plugin discovery in some environments)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run([sys.executable, "-m"] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


class TestCLISmoke:
    def test_sample_tiny(self, tmp_path):
        r = _run(["vista_tpu.cli.sample", "--tiny", "--n_steps", "2",
                  "--platform", "cpu", "--save", str(tmp_path)])
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.listdir(tmp_path / "videos"), "no video written"
        assert os.listdir(tmp_path / "grids"), "no grid written"

    def test_sample_rejects_bad_height_mesh(self):
        # fast failure path: validation fires before any compile (needs the
        # virtual multi-device env — the device-count check runs first)
        r = _run(["vista_tpu.cli.sample", "--tiny", "--platform", "cpu",
                  "--mesh-data", "3", "--mesh-mode", "height"], timeout=300,
                 env_extra={"XLA_FLAGS":
                            "--xla_force_host_platform_device_count=8"})
        assert r.returncode != 0
        assert "must divide the latent height" in r.stderr

    def test_reward_tiny(self, tmp_path):
        r = _run(["vista_tpu.cli.reward", "--tiny", "--n_steps", "2",
                  "--ens_size", "2", "--platform", "cpu",
                  "--save", str(tmp_path)])
        assert r.returncode == 0, r.stderr[-2000:]
        assert "reward" in (r.stdout + r.stderr).lower()
        # real inputs archived like the reference's reward.py:254-257
        assert os.listdir(tmp_path / "real" / "videos")
        assert os.listdir(tmp_path / "real" / "grids")

    def test_train_tiny_synthetic(self, tmp_path):
        logdir = tmp_path / "run"
        r = _run(["vista_tpu.cli.train", "--base", "configs/tiny_smoke.yaml",
                  "--synthetic-data", "--platform", "cpu",
                  f"run.logdir={logdir}", "run.max_steps=2"])
        assert r.returncode == 0, r.stderr[-2000:]
        assert (logdir / "config.yaml").exists(), "config archive missing"
        metrics = logdir / "metrics.csv"
        if metrics.exists():  # header + at least one logged step
            rows = metrics.read_text().strip().splitlines()
            assert len(rows) >= 2
