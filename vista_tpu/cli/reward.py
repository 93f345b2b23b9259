"""Reward CLI — counterpart of the reference's ``reward.py``.

Estimates the ensemble-variance confidence reward for action-conditioned
futures (defaults mirror the reference: 10 steps, ensemble 5, traj action).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="vista_tpu reward estimator")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--save", default=None,
                   help="save the real inputs (reference reward.py:254-257)")
    p.add_argument("--anno", default=None)
    p.add_argument("--data-root", default="")
    p.add_argument("--action", default="traj", choices=["free", "traj", "cmd", "steer", "goal"])
    p.add_argument("--n_frames", type=int, default=25)
    p.add_argument("--n_steps", type=int, default=10)
    p.add_argument("--ens_size", type=int, default=5)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--cfg_scale", type=float, default=2.5)
    p.add_argument("--sample_index", type=int, default=0)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--tiny", action="store_true", help="tiny model (CPU smoke run)")
    from vista_tpu.cli._common import add_platform_arg, force_platform

    add_platform_arg(p)
    args = p.parse_args(argv)
    force_platform(args.platform)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vista_tpu.diffusion import GuiderConfig, SamplerConfig
    from vista_tpu.engine import EngineConfig, VistaEngine
    from vista_tpu.engine.reward import estimate_reward

    cfg = EngineConfig()
    if args.tiny:
        cfg = cfg.tiny()
        args.n_frames = cfg.num_frames
        args.height, args.width = 32, 32
    dtype = "float32" if (args.fp32 or args.tiny) else "bfloat16"
    cfg = dataclasses.replace(
        cfg,
        num_frames=args.n_frames,
        unet=dataclasses.replace(
            cfg.unet, num_frames=args.n_frames, action_control=args.action != "free",
            dtype=dtype,
            attn_backend="pallas" if jax.default_backend() == "tpu" else "xla"),
        conditioner=dataclasses.replace(cfg.conditioner, action_control=args.action != "free"),
    )
    engine = VistaEngine(cfg)

    if args.ckpt:
        from vista_tpu.utils.checkpoint import import_vista_checkpoint, load_safetensors

        params = import_vista_checkpoint(load_safetensors(args.ckpt), cfg, strict=False)
    else:
        print("WARNING: no --ckpt given; using random weights (smoke mode)")
        params = engine.init_params(jax.random.key(0), args.height, args.width)

    batch = {
        "fps_id": jnp.array([9.0]),
        "motion_bucket_id": jnp.array([127.0]),
        "cond_aug": jnp.array([0.0]),
    }
    if args.anno:
        from vista_tpu.data.datasets import center_crop_resize
        from PIL import Image

        with open(args.anno) as f:
            anno = json.load(f)[args.sample_index]
        frames = []
        for rel in anno["frames"][: args.n_frames]:
            with Image.open(os.path.join(args.data_root, rel)) as img:
                frames.append(center_crop_resize(img.convert("RGB"), args.height, args.width))
        images = jnp.asarray(np.stack(frames))
        if args.action == "traj" and "traj" in anno:
            batch["trajectory"] = jnp.asarray(anno["traj"][2:10], jnp.float32)[None]
    else:
        rng = np.random.RandomState(args.seed)
        images = jnp.asarray(rng.randn(args.n_frames, args.height, args.width, 3)
                             .astype(np.float32) * 0.2)
        if args.action == "traj":
            batch["trajectory"] = jnp.asarray(rng.randn(1, 8), jnp.float32)

    sampler = SamplerConfig(
        num_steps=args.n_steps,
        guider=GuiderConfig(kind="vanilla", scale=args.cfg_scale, num_frames=args.n_frames))
    r = estimate_reward(engine, params, images, batch, sampler,
                        ensemble_size=args.ens_size, key=jax.random.key(args.seed))
    if args.save:
        # the reference saves only the "real" inputs for reward runs
        # (reward.py:254-257) — the reward itself needs no decode
        from vista_tpu.utils.video import save_grid_png, save_video_mp4

        name = f"reward_{args.sample_index:06d}"
        real = np.asarray(images)
        save_video_mp4(os.path.join(args.save, "real", "videos", name + ".mp4"),
                       real, real=True)
        save_grid_png(os.path.join(args.save, "real", "grids", name + ".png"),
                      real, real=True)
    print(json.dumps({"sample_index": args.sample_index, "reward": float(r)}))


if __name__ == "__main__":
    main()
