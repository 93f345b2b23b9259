"""Training CLI — counterpart of the reference's ``train.py`` launcher.

Usage:
    python -m vista_tpu.cli.train --base configs/tiny_smoke.yaml \
        [--resume logs/run/checkpoints/last] [run.max_steps=100 ...]

Configs are typed YAML (vista_tpu/config.py) merged left-to-right with
dotlist overrides. Multi-host: run one process per host; the script calls
``jax.distributed.initialize()`` when JAX_COORDINATOR_ADDRESS is set.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="vista_tpu trainer")
    p.add_argument("--base", nargs="*", default=[], help="YAML config paths (merged left-to-right)")
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument("--ckpt", default=None, help="safetensors init weights (vista/svd_xt)")
    p.add_argument("--synthetic-data", action="store_true",
                   help="use the synthetic dataset (smoke runs)")
    p.add_argument("--debug", action="store_true",
                   help="drop into pdb post-mortem on rank 0 if training "
                        "crashes (reference train.py:917-923; SIGUSR2 "
                        "additionally opens a live pdb at the next step "
                        "boundary)")
    p.add_argument("overrides", nargs="*", help="a.b.c=value dotlist overrides")
    from vista_tpu.cli._common import add_platform_arg, force_platform

    add_platform_arg(p)
    args = p.parse_args(argv)
    force_platform(args.platform)

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    from vista_tpu.config import load_config
    from vista_tpu.data import build_pipeline
    from vista_tpu.runner import ExperimentConfig, Trainer

    cfg = load_config(ExperimentConfig, args.base, args.overrides)

    # real sources (youtube/nuscenes anno files) come from the config's
    # `data:` section; --synthetic-data (or no sources) forces synthetic.
    # process_index decorrelates multi-host sampling streams (each host
    # contributes a distinct local shard of the global batch).
    import jax

    pipeline = build_pipeline(cfg.data, cfg.height, cfg.width,
                              cfg.engine.num_frames, synthetic=args.synthetic_data,
                              process_index=jax.process_index())

    init_params = None
    if args.ckpt:
        from vista_tpu.utils.checkpoint import import_vista_checkpoint, load_safetensors

        print(f"importing torch checkpoint {args.ckpt}")
        init_params = import_vista_checkpoint(load_safetensors(args.ckpt), cfg.engine,
                                              strict=False)

    try:
        trainer = Trainer(cfg, pipeline, init_params=init_params)
        if args.resume:
            trainer.resume(args.resume)
            print(f"resumed from {args.resume} at step {int(trainer.state.step)}")
        state = trainer.fit()
    except Exception:
        # the reference's --debug post-mortem (train.py:917-923): rank 0
        # opens pdb at the crash frame, then the exception propagates so the
        # launcher still sees a non-zero exit
        if args.debug and jax.process_index() == 0:
            import pdb
            import traceback

            traceback.print_exc()
            pdb.post_mortem()
        raise
    print(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
