"""Op-level device-time profile of the first-stage decode (576x1024).

The headline bench's non-sampling tail is the overlap-blended VideoVAEDecoder
over 25 frames (decode_chunk=14). Round-1 measured ~13 TF/s here vs 119-172
in the UNet convs; this captures an xplane of the full decode program so
tools/xprof.py can say which ops are slow (suspects: the (3,1,1) temporal
convs on 5-D (1, t, h, w, c) tensors, GroupNorm fp32 round trips).

Usage: python tools/profile_decode.py [--height 576 --width 1024 --frames 25]
then: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/xprof.py <xplane>
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--frames", type=int, default=25)
    p.add_argument("--decode-chunk", type=int, default=None,
                   help="override EngineConfig.decode_chunk (window sweep)")
    p.add_argument("--no-trace", action="store_true",
                   help="skip the xplane capture (timing-only sweep)")
    p.add_argument("--logdir", default="/tmp/vista_decode_prof")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vista_tpu.engine.engine import EngineConfig, VistaEngine

    cfg = EngineConfig()
    if args.decode_chunk is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, decode_chunk=args.decode_chunk)
    engine = VistaEngine(cfg)
    f = cfg.vae.downsample_factor
    hl, wl = args.height // f, args.width // f
    zc = cfg.vae.z_channels

    k = jax.random.key(0)
    dec_params = jax.jit(engine.decoder.init, static_argnums=(2,))(
        k, jnp.zeros((cfg.decode_chunk, hl, wl, zc)), cfg.decode_chunk)
    params = {"decoder": jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        dec_params["params"])}

    z = jax.random.normal(jax.random.key(1), (args.frames, hl, wl, zc), jnp.float32)
    fn = jax.jit(engine.decode_first_stage)
    print("compile...", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(fn(params, z))
    print(f"  {time.time()-t0:.1f}s out {out.shape}", flush=True)

    # timed: fresh input + scalar fetch (tunnel memoization)
    summ = jax.jit(lambda p, z: jnp.sum(engine.decode_first_stage(p, z)))
    float(summ(params, z))
    t0 = time.time()
    float(summ(params, z + 1.0))
    dt = time.time() - t0
    print(f"decode {args.frames} frames: {dt:.3f}s = {args.frames/dt:.2f} f/s", flush=True)

    if args.no_trace:
        return
    os.system(f"rm -rf {args.logdir}")
    jax.profiler.start_trace(args.logdir)
    jax.block_until_ready(fn(params, z + 2.0))
    jax.profiler.stop_trace()
    xplane = glob.glob(f"{args.logdir}/**/*.xplane.pb", recursive=True)
    print("xplane:", xplane, flush=True)


if __name__ == "__main__":
    main()
