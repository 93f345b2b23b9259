"""Long-horizon rollout benchmark — BASELINE config #4 (reference reward.py /
multi-round sample.py path) through the REAL engine: conditioner (CLIP +
shared VAE encoder), multi-round autoregressive rollout with latent reuse,
chunked decode, and the ensemble-variance reward.

Reports seconds per extension round and the reward-path latency.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cast_bf16_and_free(tree):
    """Leaf-wise fp32 -> bf16 cast that frees each fp32 buffer immediately
    (avoids holding both copies of multi-GB param trees)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    seen = {}  # id(fp32 leaf) -> bf16 copy (tied weights appear twice)
    out = []
    for leaf in leaves:
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
            if id(leaf) not in seen:
                new = jax.block_until_ready(leaf.astype(jnp.bfloat16))
                leaf.delete()
                seen[id(leaf)] = new
            out.append(seen[id(leaf)])
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--ens-size", type=int, default=2)
    p.add_argument("--skip-reward", action="store_true")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vista_tpu.diffusion import GuiderConfig, SamplerConfig
    from vista_tpu.engine import EngineConfig, RolloutConfig, VistaEngine, autoregressive_rollout
    from vista_tpu.engine.reward import estimate_reward

    import dataclasses

    cfg = EngineConfig()
    cfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(
            cfg.unet, attn_backend="pallas" if jax.default_backend() == "tpu" else "xla"))
    engine = VistaEngine(cfg)
    t = cfg.num_frames

    print("initializing engine params...", flush=True)
    params = engine.init_params(jax.random.key(0), args.height, args.width)
    params = cast_bf16_and_free(params)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(t, args.height, args.width, 3).astype(np.float32) * 0.2)
    batch = {
        "fps_id": jnp.array([9.0]),
        "motion_bucket_id": jnp.array([127.0]),
        "cond_aug": jnp.array([0.0]),
    }
    sampler = SamplerConfig(
        num_steps=args.steps,
        guider=GuiderConfig(kind="triangle", scale=2.5, num_frames=t))

    print("running rollout (compile on first round)...", flush=True)
    t0 = time.perf_counter()
    pixels, latents = autoregressive_rollout(
        engine, params, images, batch, sampler,
        RolloutConfig(num_rounds=args.rounds), key=jax.random.key(1))
    _ = float(pixels.mean())
    total = time.perf_counter() - t0
    n_frames = latents.shape[0]
    print(f"rollout: {args.rounds} rounds -> {n_frames} frames in {total:.1f}s "
          f"(incl. compile)", flush=True)

    # timed second rollout (programs cached)
    t0 = time.perf_counter()
    pixels, latents = autoregressive_rollout(
        engine, params, images, batch, sampler,
        RolloutConfig(num_rounds=args.rounds), key=jax.random.key(2))
    _ = float(pixels.mean())
    total = time.perf_counter() - t0
    per_round = total / args.rounds
    print(f"rollout steady-state: {total:.1f}s total, {per_round:.2f}s/round, "
          f"{n_frames/total:.3f} frames/sec incl. decode+conditioning", flush=True)

    if not args.skip_reward:
        sampler_r = SamplerConfig(
            num_steps=args.steps, guider=GuiderConfig(kind="vanilla", scale=2.5, num_frames=t))
        t0 = time.perf_counter()
        r = estimate_reward(engine, params, images, batch, sampler_r,
                            ensemble_size=args.ens_size, key=jax.random.key(3))
        r = float(r)
        print(f"reward (ens={args.ens_size}, incl. compile): {r:.6f} "
              f"in {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
