"""Quality harness: Fréchet CLIP distance + PSNR/SSIM for generated rollouts.

BASELINE.md's quality target is FVD parity against the released
``vista.safetensors``. True FVD needs Kinetics-I3D clip features (no I3D
checkpoint ships in this environment); this harness computes the same
Fréchet statistic over per-frame **CLIP ViT-H** embeddings — the engine's
own frozen conditioner tower — as the offline proxy (FCD), plus PSNR/SSIM
of the prediction against the ground-truth continuation. The Fréchet math
(``vista_tpu/utils/metrics.py``) is feature-agnostic: I3D features plug in
unchanged once available. Real FVD protocols use hundreds of clips; with a
handful this is a harness check, not a quality claim.

Usage:
  python tools/quality_bench.py --smoke --platform cpu        # harness check
  python tools/quality_bench.py --ckpt vista.safetensors \
      --anno annos/val.json --data-root data/ --n-clips 128   # real eval
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--anno", default=None)
    p.add_argument("--data-root", default="")
    p.add_argument("--n-clips", type=int, default=2)
    p.add_argument("--n_steps", type=int, default=3)
    p.add_argument("--cfg_scale", type=float, default=2.5)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--smoke", action="store_true",
                   help="tiny engine + synthetic clips (harness check)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="also write the JSON artifact to this path (the "
                        "round-tracked QUALITY_r*.json)")
    from vista_tpu.cli._common import add_platform_arg, force_platform

    add_platform_arg(p)
    args = p.parse_args()
    force_platform(args.platform)

    import jax

    # same persistent compile cache as bench.py: the realistic-scale run
    # (320x576/25f, VERDICT r3 item 6) shares sampling-program compiles with
    # bench.py config #1 and with its own reruns across rounds.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         os.path.expanduser("~/.cache/vista_tpu_xla")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from vista_tpu.diffusion import GuiderConfig, SamplerConfig
    from vista_tpu.engine import EngineConfig, VistaEngine
    from vista_tpu.engine.rollout import RolloutConfig, autoregressive_rollout
    from vista_tpu.models.clip import CLIPVisionTower, clip_preprocess
    from vista_tpu.utils.metrics import frechet_feature_distance, psnr, ssim

    cfg = EngineConfig()
    if args.smoke:
        cfg = cfg.tiny()
        args.height = args.width = 8 * 4  # tiny VAE: 4x4 latents
    dtype = "float32" if args.smoke else "bfloat16"
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(
            cfg.unet, dtype=dtype,
            attn_backend="pallas" if jax.default_backend() == "tpu" else "xla"))
    engine = VistaEngine(cfg)
    t = cfg.num_frames

    if args.ckpt:
        from vista_tpu.utils.checkpoint import import_vista_checkpoint, load_safetensors

        params = import_vista_checkpoint(load_safetensors(args.ckpt), cfg, strict=False)
    else:
        print("no --ckpt: random weights (harness check only)", flush=True)
        params = engine.init_params(jax.random.key(0), args.height, args.width)

    # ground-truth clips
    clips = []
    if args.anno:
        from PIL import Image

        from vista_tpu.data.datasets import center_crop_resize

        with open(args.anno) as f:
            annos = json.load(f)
        for anno in annos[: args.n_clips]:
            frames = [center_crop_resize(
                Image.open(os.path.join(args.data_root, rel)).convert("RGB"),
                args.height, args.width) for rel in anno["frames"][:t]]
            clips.append(np.stack(frames))
    else:
        rng = np.random.RandomState(args.seed)
        for _ in range(args.n_clips):
            # smooth drifting pattern: PSNR/SSIM are meaningful, unlike noise
            base = rng.randn(args.height // 8, args.width // 8, 3) * 0.5
            big = np.asarray(jax.image.resize(
                jnp.asarray(base), (args.height, args.width, 3), "linear"))
            clip = np.stack([np.roll(big, 2 * i, axis=1) for i in range(t)])
            clips.append(np.clip(clip, -1, 1).astype(np.float32))

    batch = {
        "fps_id": jnp.array([9.0]),
        "motion_bucket_id": jnp.array([127.0]),
        "cond_aug": jnp.array([0.0]),
    }
    sampler = SamplerConfig(
        num_steps=args.n_steps,
        guider=GuiderConfig(kind="vanilla", scale=args.cfg_scale, num_frames=t))

    gen_clips = []
    for i, real in enumerate(clips):
        pixels, _ = autoregressive_rollout(
            engine, params, jnp.asarray(real), batch, sampler,
            RolloutConfig(num_rounds=1), key=jax.random.key(args.seed + i))
        gen_clips.append(np.asarray(pixels))
        print(f"clip {i}: generated {gen_clips[-1].shape}", flush=True)

    # per-frame CLIP features through the engine's own frozen tower
    tower = CLIPVisionTower(cfg.conditioner.clip)
    tower_params = {"params": params["conditioner"]["clip_tower"]}
    # params as a jit ARGUMENT: closing over them bakes the ~2.5 GB fp32
    # ViT-H weights into the executable as constants (CLAUDE.md gotcha)
    feat_fn = jax.jit(lambda p, x: tower.apply(
        p, clip_preprocess(x, cfg.conditioner.clip.image_size)))
    real_feats = np.concatenate(
        [np.asarray(feat_fn(tower_params, jnp.asarray(c))) for c in clips])
    gen_feats = np.concatenate(
        [np.asarray(feat_fn(tower_params, jnp.asarray(c))) for c in gen_clips])

    fcd = frechet_feature_distance(real_feats, gen_feats)
    psnrs = [psnr(g, r) for g, r in zip(gen_clips, clips)]
    ssims = [ssim(g, r) for g, r in zip(gen_clips, clips)]
    assert np.isfinite(fcd) and all(np.isfinite(v) for v in psnrs + ssims)

    payload = {
        "metric": f"quality ({len(clips)} clips x {t} frames, "
                  f"{args.width}x{args.height}, {args.n_steps} steps, "
                  f"{'random weights' if not args.ckpt else os.path.basename(args.ckpt)})",
        "frechet_clip_distance": round(fcd, 3),
        "psnr_db": round(float(np.mean(psnrs)), 2),
        "ssim": round(float(np.mean(ssims)), 4),
        "config": {
            "height": args.height, "width": args.width, "frames": t,
            "n_clips": len(clips), "n_steps": args.n_steps,
            "cfg_scale": args.cfg_scale, "seed": args.seed,
            "weights": os.path.basename(args.ckpt) if args.ckpt else "random",
            "clips": "anno" if args.anno else "synthetic",
            "backend": jax.default_backend(),
        },
        "note": "CLIP-feature Fréchet proxy for FVD: per-frame ViT-H "
                "embeddings instead of I3D clip features — the Fréchet math "
                "is feature-agnostic and closed-form tested, but the "
                "CLIP-vs-I3D correlation is UNVALIDATED here (no I3D "
                "checkpoint in this environment); treat as a "
                "regression-detection statistic, not an FVD claim. Plug I3D "
                "features into utils/metrics.frechet_distance for true FVD.",
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
