"""Debug affordances: SIGUSR2 live-pdb hook (reference train.py:883-892) and
the --debug post-mortem flag (train.py:917-923). The debugger itself is
monkeypatched — these tests pin the wiring (deferred-to-step-boundary flag,
rank-0 gating, exception still propagating), not pdb."""

import dataclasses
import os
import signal

import pytest

from vista_tpu.config import load_config
from vista_tpu.data import build_pipeline
from vista_tpu.runner import ExperimentConfig, Trainer

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "tiny_smoke.yaml")


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = load_config(ExperimentConfig, [CFG_PATH], [
        f"run.logdir={tmp_path_factory.mktemp('dbg')}", "run.max_steps=1",
    ])
    pipeline = build_pipeline(
        dataclasses.replace(cfg.data, batch_size=8, num_threads=1),
        cfg.height, cfg.width, cfg.engine.num_frames, synthetic=True)
    return Trainer(cfg, pipeline)


class TestSigusr2:
    def test_handler_sets_deferred_flag(self, trainer):
        trainer.install_signal_handlers()
        try:
            assert not getattr(trainer, "_debug_requested", False)
            os.kill(os.getpid(), signal.SIGUSR2)
            assert trainer._debug_requested
        finally:
            signal.signal(signal.SIGUSR2, signal.SIG_DFL)
            signal.signal(signal.SIGUSR1, signal.SIG_DFL)
            signal.signal(signal.SIGTERM, signal.SIG_DFL)
            trainer._debug_requested = False

    def test_maybe_divein_opens_and_clears(self, trainer, monkeypatch):
        import pdb

        opened = []
        monkeypatch.setattr(pdb.Pdb, "set_trace", lambda self, *a: opened.append(1))
        trainer._debug_requested = True
        trainer._maybe_divein()
        assert opened == [1]
        assert not trainer._debug_requested
        trainer._maybe_divein()  # no re-entry without a new signal
        assert opened == [1]


class TestDebugFlag:
    def test_post_mortem_then_reraise(self, monkeypatch, tmp_path):
        import pdb

        from vista_tpu.cli import train as train_cli

        called = []
        monkeypatch.setattr(pdb, "post_mortem", lambda *a: called.append(1))
        monkeypatch.setattr(
            "vista_tpu.runner.Trainer.fit",
            lambda self: (_ for _ in ()).throw(RuntimeError("boom")))
        argv = ["--base", CFG_PATH, "--synthetic-data", "--debug",
                "--platform", "cpu", f"run.logdir={tmp_path}",
                "run.max_steps=1", "data.batch_size=8"]
        with pytest.raises(RuntimeError, match="boom"):
            train_cli.main(argv)
        assert called == [1]
