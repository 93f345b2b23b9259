"""Sampling CLI — counterpart of the reference's ``sample.py``.

Runs the (multi-round) autoregressive rollout and saves videos / grids /
frames. Action conditioning mirrors the reference modes: traj / cmd /
steer / goal (sample.py:29-119).

Usage:
    python -m vista_tpu.cli.sample --n_rounds 2 --n_steps 10 \
        --height 320 --width 576 [--ckpt ckpts/vista.safetensors] \
        [--anno path.json --data-root DIR] [--action traj]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="vista_tpu sampler")
    p.add_argument("--ckpt", default=None, help="vista.safetensors weights")
    p.add_argument("--anno", default=None, help="annotation JSON (nuScenes-style)")
    p.add_argument("--image", default=None,
                   help="single conditioning image (the reference's IMG mode)")
    p.add_argument("--data-root", default="", help="frame root dir")
    p.add_argument("--save", default="outputs", help="output dir")
    p.add_argument("--action", default="free",
                   choices=["free", "traj", "cmd", "steer", "goal"])
    p.add_argument("--n_rounds", type=int, default=1)
    p.add_argument("--n_frames", type=int, default=25)
    p.add_argument("--n_steps", type=int, default=50)
    p.add_argument("--n_conds", type=int, default=1)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--cfg_scale", type=float, default=2.5)
    p.add_argument("--cond_aug", type=float, default=0.0)
    p.add_argument("--sample_index", type=int, default=0)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--fp32", action="store_true", help="run fp32 (CPU debugging)")
    p.add_argument("--tiny", action="store_true", help="tiny model (CPU smoke run)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard the denoise rounds over this many devices "
                        "(frame axis; n_frames must divide it; 0 = single device)")
    p.add_argument("--mesh-mode", default="frames",
                   choices=["frames", "height", "weights"],
                   help="sharded-denoise layout: frames (data-parallel over the "
                        "video axis), height (sequence-parallel latent rows), or "
                        "weights (ZeRO-style sharded params for HBM relief)")
    from vista_tpu.cli._common import add_platform_arg, force_platform

    add_platform_arg(p)
    args = p.parse_args(argv)
    force_platform(args.platform)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vista_tpu.diffusion import GuiderConfig, SamplerConfig
    from vista_tpu.engine import EngineConfig, RolloutConfig, VistaEngine, autoregressive_rollout
    from vista_tpu.utils.video import save_frames_png, save_grid_png, save_video_mp4

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
            cfg.unet, num_frames=args.n_frames,
            action_control=args.action != "free",
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

    # ---- inputs ----
    batch = {
        "fps_id": jnp.array([9.0]),
        "motion_bucket_id": jnp.array([127.0]),
        "cond_aug": jnp.array([args.cond_aug]),
    }
    if args.image:
        # IMG mode: one image conditions the whole clip (sample.py IMG dataset)
        from vista_tpu.data.datasets import center_crop_resize
        from PIL import Image

        with Image.open(args.image) as img:
            frame = center_crop_resize(img.convert("RGB"), args.height, args.width)
        images = jnp.asarray(np.repeat(frame[None], args.n_frames, axis=0))
    elif args.anno:
        from vista_tpu.data.datasets import center_crop_resize
        from PIL import Image

        with open(args.anno) as f:
            annos = json.load(f)
        anno = annos[args.sample_index]
        frames = []
        for rel in anno["frames"][: args.n_frames]:
            with Image.open(os.path.join(args.data_root, rel)) as img:
                frames.append(center_crop_resize(img.convert("RGB"), args.height, args.width))
        images = jnp.asarray(np.stack(frames))
        if args.action == "traj" and "traj" in anno:
            batch["trajectory"] = jnp.asarray(anno["traj"][2:10], jnp.float32)[None]
        elif args.action == "cmd" and "cmd" in anno:
            batch["command"] = jnp.asarray([[float(anno["cmd"])]])
        elif args.action == "steer" and "speed" in anno:
            batch["speed"] = jnp.asarray(anno["speed"][1:5], jnp.float32)[None]
            batch["angle"] = jnp.asarray(anno["angle"][1:5], jnp.float32)[None] / 780.0
        elif args.action == "goal" and "z" in anno:
            batch["goal"] = jnp.asarray(
                [[anno["goal"][0] / 1600.0, anno["goal"][1] / 900.0]], jnp.float32)
    else:
        print("no --anno: using random context frames (smoke mode)")
        rng = np.random.RandomState(args.seed)
        images = jnp.asarray(rng.randn(args.n_frames, args.height, args.width, 3)
                             .astype(np.float32) * 0.2)

    guider = GuiderConfig(
        kind="triangle" if args.n_rounds > 1 else "vanilla",
        scale=args.cfg_scale, min_scale=1.0, num_frames=args.n_frames)
    sampler = SamplerConfig(num_steps=args.n_steps, guider=guider)
    rollout = RolloutConfig(num_rounds=args.n_rounds,
                            initial_cond_indices=tuple(range(args.n_conds)))

    mesh = None
    if args.mesh_data:
        devs = jax.devices()
        if len(devs) < args.mesh_data:
            raise SystemExit(f"--mesh-data {args.mesh_data}: only {len(devs)} devices")
        if args.mesh_mode == "frames" and args.n_frames % args.mesh_data:
            raise SystemExit(f"--mesh-data {args.mesh_data} must divide n_frames={args.n_frames}")
        if args.mesh_mode == "height" and (args.height // 8) % args.mesh_data:
            raise SystemExit(f"--mesh-data {args.mesh_data} must divide the "
                             f"latent height {args.height // 8}")
        mesh = jax.sharding.Mesh(np.array(devs[: args.mesh_data]), ("data",))

    pixels, latents = autoregressive_rollout(
        engine, params, images, batch, sampler, rollout,
        key=jax.random.key(args.seed), mesh=mesh, mesh_mode=args.mesh_mode)
    pixels = np.asarray(pixels)

    name = f"sample_{args.sample_index:06d}"
    save_video_mp4(os.path.join(args.save, "videos", name + ".mp4"), pixels)
    save_grid_png(os.path.join(args.save, "grids", name + ".png"), pixels)
    save_frames_png(os.path.join(args.save, "images"), pixels, prefix=name)
    save_video_mp4(os.path.join(args.save, "videos_real", name + ".mp4"),
                   np.asarray(images), real=True)
    print(f"saved {pixels.shape[0]} frames to {args.save}")


if __name__ == "__main__":
    main()
