"""Subprocess driver for the multi-host (multi-process) Trainer test.

Runs N trainer steps of the tiny config on a {data:4, fsdp:2} mesh, either
as one process with 8 virtual CPU devices or as one rank of a 2-process
Gloo-coordinated job with 4 virtual devices each. The global batch is
derived from a fixed numpy seed so both topologies feed identical data;
each rank slices off its process-local shard and feeds it through
``Trainer._put_batch`` (``jax.make_array_from_process_local_data`` on the
multi-process path — the reference counterpart is torchrun + DDP,
docs/TRAINING.md:59-67).

Invoked by tests/test_multihost.py; not a user-facing tool.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default="localhost:52399")
    ap.add_argument("--local-devices", type=int, default=8)
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices} "
        + os.environ.get("XLA_FLAGS", "")).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    # one host core: full-opt XLA compiles take many minutes and two ranks
    # compile concurrently; correctness-only passes suffice here (the
    # multichip dryrun uses the same trade, __graft_entry__._dryrun_impl)
    jax.config.update("jax_disable_most_optimizations", True)
    if args.num_processes > 1:
        # the real multi-host init path (cli/train.py's counterpart): Gloo
        # CPU collectives stand in for ICI/DCN
        jax.distributed.initialize(args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    assert jax.device_count() == 8, jax.devices()

    import numpy as np

    from vista_tpu.config import load_config
    from vista_tpu.runner import ExperimentConfig, Trainer

    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "configs", "tiny_smoke.yaml")
    cfg = load_config(ExperimentConfig, [cfg_path], [
        f"run.logdir={args.logdir}",
        "parallel.data=4", "parallel.fsdp=2",
    ])
    trainer = Trainer(cfg, pipeline=None)

    b_global = 4
    n_local = b_global * args.local_devices // 8
    lo = args.process_id * n_local
    t = cfg.engine.num_frames
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(args.steps):
        batch = {
            "frames": rng.uniform(-1, 1, (b_global, t, cfg.height, cfg.width, 3))
                         .astype(np.float32),
            "fps_id": np.full((b_global,), 9.0, np.float32),
            "motion_bucket_id": np.full((b_global,), 127.0, np.float32),
            "cond_aug": np.zeros((b_global,), np.float32),
        }
        local = {k: v[lo:lo + n_local] for k, v in batch.items()}
        device_batch = trainer._put_batch(local)
        key = jax.random.fold_in(jax.random.key(cfg.run.seed),
                                 int(trainer.state.step))
        trainer.state, metrics = trainer.step_fn(
            trainer.state, trainer.frozen, device_batch, key)
        losses.append(float(metrics["loss"]))

    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump({"losses": losses}, f)


if __name__ == "__main__":
    main()
