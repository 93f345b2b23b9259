"""Multi-host (multi-process) training path (SURVEY.md §2.8 row 3).

``jax.distributed.initialize`` (cli/train.py) and
``make_array_from_process_local_data`` (runner.py ``_put_batch``) were dead
code until this test: two coordinated CPU processes with 4 virtual devices
each must produce the same global 8-device mesh, assemble the same global
batch from per-process shards, and land on the SAME losses as the
single-process 8-device run. The reference counterpart is its torchrun
multi-node flow (docs/TRAINING.md:59-67), which it never tests either.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_driver.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    # subprocesses own their XLA device-count flags; PYTHONPATH breaks
    # backend plugin discovery in some environments (see tests/test_cli.py)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_two_process_trainer_matches_single_process(tmp_path):
    out_single = tmp_path / "single.json"
    r = subprocess.run(
        [sys.executable, DRIVER, "--num-processes", "1", "--local-devices", "8",
         "--logdir", str(tmp_path / "run1"), "--out", str(out_single)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]

    port = _free_port()
    out_multi = tmp_path / "multi.json"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, DRIVER, "--process-id", str(pid),
             "--num-processes", "2", "--local-devices", "4",
             "--coordinator", f"localhost:{port}",
             "--logdir", str(tmp_path / f"run2_{pid}"),
             "--out", str(out_multi)],
            cwd=REPO, env=_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), errs

    l_single = json.load(open(out_single))["losses"]
    l_multi = json.load(open(out_multi))["losses"]
    assert len(l_single) == 2 and np.all(np.isfinite(l_single))
    # same logical program on the same global mesh: only the device->process
    # mapping differs, so losses agree to float-reduction noise
    np.testing.assert_allclose(l_single, l_multi, rtol=1e-5, atol=1e-6)
