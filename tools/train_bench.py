"""BASELINE config #5: training-step throughput on one chip (576x320-class).

Measures the UNet forward+backward over the full diffusion loss (dynamics
weighting + Fourier HF term, cond-mask choices) at phase-2-stage-1 scale
(320x576, 25 frames) — the compute-dominant part of a training step, and the
path that exercises the Pallas flash-attention BACKWARD kernels.

Scope note (kept honest): fp32 Adam moments for the 1.5B-param UNet are
~18 GB and do not fit one 16 GB v5e — the full optimizer step runs FSDP-
sharded across >=2 chips (runner.Trainer / dryrun_multichip cover that
path). Here params are bf16 and the optimizer update is excluded; the
reference side (train.py, 8xA100 80GB) has no single-GPU counterpart at
all. Reference: configs/training/vista_phase2_stage1.yaml, train.py:728-741.

Usage: python tools/train_bench.py [--height 320 --width 576 --frames 25]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--frames", type=int, default=25)
    p.add_argument("--attn", default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--remat", default="on",
                   choices=["on", "off", "ds1", "ds2", "ds4", "names", "dots"],
                   help="A/B knob: block-level activation checkpointing. "
                        "'off' stores all block intermediates instead of "
                        "recomputing them in backward — trades HBM for the "
                        "~fwd-cost recompute (only viable where activations "
                        "fit; 16 GB holds 320x576/25f, NOT 576x1024 — "
                        "measured OOM). 'dsN' remats only blocks at "
                        "downsample factor <= N and stores the deeper "
                        "(small-activation) blocks (remat_max_ds). "
                        "'names'/'dots' keep every block rematted but SAVE "
                        "the attention/FF outputs (save_only_these_names / "
                        "dots_with_no_batch_dims_saveable policies) — the "
                        "middle ground between 'on' and 'off'")
    p.add_argument("--xla-bwd", action="store_true",
                   help="A/B knob: route every fused kernel's backward "
                        "through its XLA-recompute fallback instead of the "
                        "Pallas backward kernels")
    p.add_argument("--xla-wide-ff-bwd", action="store_true",
                   help="A/B knob: route ONLY the wide (c>640) fused-FF "
                        "backward through the serial chunked XLA-recompute "
                        "VJP instead of the activation-export Pallas kernel")
    p.add_argument("--temporal-conv", default="pallas",
                   choices=["pallas", "packed"],
                   help="A/B knob: Pallas 3-tap temporal conv vs the "
                        "round-2 packed-matmul form (packed implies "
                        "--fused-gn off: the full round-2 conv stack)")
    p.add_argument("--fused-gn", default="on", choices=["on", "off"],
                   help="A/B knob: fused GN+SiLU+conv3 TemporalResBlock "
                        "kernels vs XLA elementwise + plain temporal_conv3")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache (same dir as bench.py): the full-res fwd+bwd
    # program compiles ~20 min cold on the single host core; identical-config
    # reruns become a disk read
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         os.path.expanduser("~/.cache/vista_tpu_xla")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if args.temporal_conv == "packed" or args.fused_gn == "off":
        import vista_tpu.ops.temporal_conv as _tc

        if args.temporal_conv == "packed":
            # packed implies the round-2 conv stack: _PALLAS=False already
            # reroutes the fused-GN forwards to the XLA compose, so flip the
            # gate too rather than measure a half-fused hybrid
            _tc._PALLAS = False
            _tc._FUSED_GN = False
        if args.fused_gn == "off":
            _tc._FUSED_GN = False
    if args.xla_bwd:
        import vista_tpu.ops.fused_ff as _ff
        import vista_tpu.ops.fused_qkv as _qkv
        import vista_tpu.ops.fused_temporal_attn as _ta
        import vista_tpu.ops.tiny_attention as _tiny

        _ff.MAX_FUSED_BWD_DIM = 0
        _qkv.MAX_FUSED_BWD_DIM = 0
        _ta._PALLAS_BWD = False
        _tiny._PALLAS_BWD = False
    if args.xla_wide_ff_bwd:
        import vista_tpu.ops.fused_ff as _ff

        _ff._WIDE_PALLAS_BWD = False

    from vista_tpu.diffusion.loss import LossConfig, diffusion_loss
    from vista_tpu.diffusion.denoiser import precondition_denoise
    from vista_tpu.models.unet import VideoUNet, VideoUNetConfig

    remat_max_ds = {"ds1": 1, "ds2": 2, "ds4": 4}.get(args.remat)
    remat_policy = args.remat if args.remat in ("names", "dots") else None
    ucfg = VideoUNetConfig(attn_backend=args.attn, remat=args.remat != "off",
                           remat_max_ds=remat_max_ds, remat_policy=remat_policy)
    unet = VideoUNet(ucfg)
    t = args.frames
    hl, wl = args.height // 8, args.width // 8
    lat_c = ucfg.out_channels

    x = jnp.zeros((t, hl, wl, lat_c), jnp.float32)
    ctx = jnp.zeros((1, 1, ucfg.context_dim), jnp.float32)
    y = jnp.zeros((1, ucfg.adm_in_channels), jnp.float32)

    print("init (jitted)...", flush=True)
    t0 = time.time()
    concat0 = jnp.zeros((t, hl, wl, lat_c), jnp.float32)
    params = jax.jit(unet.init, static_argnums=(6,))(
        jax.random.key(0),
        jnp.concatenate([x, concat0], axis=-1), jnp.zeros((t,)), ctx, y,
        jnp.zeros((t,)), t)["params"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
    n_params = sum(a.size for a in jax.tree.leaves(params))
    print(f"  {time.time()-t0:.1f}s ({n_params/1e9:.2f}B params)", flush=True)

    # phase-2 settings: dynamics-enhancement + HF loss on, cond-frame replacement
    lcfg = LossConfig(num_frames=t, use_additional_loss=True,
                      replace_cond_frames=True)

    def network_fn(xin, c_noise, cond, cond_mask):
        xa = jnp.concatenate([xin, cond["concat"].astype(xin.dtype)], axis=-1)
        return unet.apply({"params": cond["_params"]}, xa, c_noise,
                          cond["crossattn"], cond["vector"], cond_mask, t)

    def loss_for(params, latents, cond, key):
        cond = {**cond, "_params": params}
        denoise = lambda xi, s, c, cm: precondition_denoise(network_fn, xi, s, c, cm)
        loss, _ = diffusion_loss(denoise, latents, cond, key, lcfg)
        return loss

    latents = jax.random.normal(jax.random.key(1), (t, hl, wl, lat_c))
    cond = {
        "concat": jnp.concatenate(
            [latents[:1]] + [jnp.zeros_like(latents[:1])] * (t - 1), 0),
        "crossattn": jax.random.normal(jax.random.key(2), (1, 1, ucfg.context_dim)),
        "vector": jax.random.normal(jax.random.key(3), (1, ucfg.adm_in_channels)),
    }

    # fresh key per iter + scalar fetch (tunnel memoization). The grad tree
    # reduces to ONE scalar inside the program — materializing a full grad
    # pytree output and holding it across calls costs 3 GB of HBM that the
    # 576x1024 step needs (measured: it is the difference between fitting
    # and ResourceExhausted on a 16 GB chip).
    summ = jax.jit(lambda p, z, c, k: sum(
        jnp.sum(a.astype(jnp.float32)) for a in jax.tree.leaves(
            jax.grad(loss_for)(p, z, c, k))))

    print("compile fwd+bwd...", flush=True)
    t0 = time.time()
    float(summ(params, latents, cond, jax.random.key(5)))
    print(f"  {time.time()-t0:.1f}s", flush=True)
    times = []
    for i in range(args.iters):
        zi = latents + 0.001 * (i + 1)
        t0 = time.perf_counter()
        float(summ(params, zi, cond, jax.random.key(6 + i)))
        times.append(time.perf_counter() - t0)
    if os.environ.get("TRAIN_BENCH_PROFILE"):
        import glob
        logdir = "/tmp/vista_train_prof"
        os.system(f"rm -rf {logdir}")
        jax.profiler.start_trace(logdir)
        float(summ(params, latents + 0.5, cond, jax.random.key(99)))
        jax.profiler.stop_trace()
        print("xplane:", glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True),
              flush=True)

    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": f"train fwd+bwd steps/sec ({args.height}x{args.width}, "
                  f"{t}f, full loss, bf16"
                  + {"on": "+remat", "off": ", no remat",
                     "names": "+remat(save attn/ff)",
                     "dots": "+remat(save dots)"}.get(
                      args.remat, f", remat<= {args.remat}") + ")",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec",
        "sec_per_step": round(dt, 3),
        "frames_per_sec": round(t / dt, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
