"""Op-level device-time profile of the headline denoise step (576x1024).

Captures a jax.profiler XPlane trace of the CFG-batched UNet eval (the
program that is ~96% of headline wall time) and prints the top XLA
ops/fusions by device self-time, bucketed into categories (conv, attention
matmul, norm, transpose/copy, elementwise). This tells us where the non-MXU
half of the step goes.

Usage:  python tools/profile_headline.py [--height 576 --width 1024]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--frames", type=int, default=25)
    p.add_argument("--cfg-batch", type=int, default=2)
    p.add_argument("--attn", default="pallas", choices=["pallas", "xla"])
    p.add_argument("--logdir", default="/tmp/vista_prof")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vista_tpu.models.unet import VideoUNet, VideoUNetConfig

    ucfg = VideoUNetConfig(attn_backend=args.attn)
    unet = VideoUNet(ucfg)
    t = args.frames
    bt = args.cfg_batch * t
    hl, wl = args.height // 8, args.width // 8

    x = jnp.zeros((bt, hl, wl, ucfg.in_channels), jnp.float32)
    c_noise = jnp.zeros((bt,), jnp.float32)
    ctx = jnp.zeros((args.cfg_batch, 1, ucfg.context_dim), jnp.float32)
    y = jnp.zeros((args.cfg_batch, ucfg.adm_in_channels), jnp.float32)
    cond_mask = jnp.zeros((bt,), jnp.float32)

    print("init (jitted)...", flush=True)
    t0 = time.time()
    params = jax.jit(unet.init, static_argnums=(6,))(
        jax.random.key(0), x[:t], c_noise[:t], ctx[:1], y[:1], cond_mask[:t], t)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
    print(f"  {time.time()-t0:.1f}s", flush=True)

    fwd = jax.jit(
        lambda p, x, cn, ctx, y, cm: unet.apply(p, x, cn, ctx, y, cm, t))
    print("compile...", flush=True)
    t0 = time.time()
    out = jax.block_until_ready(fwd(params, x, c_noise, ctx, y, cond_mask))
    print(f"  {time.time()-t0:.1f}s out {out.shape}", flush=True)

    # timed run (fresh input each iter to dodge tunnel memoization)
    for i in range(2):
        xi = x + i + 1
        t0 = time.time()
        jax.block_until_ready(fwd(params, xi, c_noise, ctx, y, cond_mask))
        print(f"iter {i}: {time.time()-t0:.3f}s", flush=True)

    os.system(f"rm -rf {args.logdir}")
    jax.profiler.start_trace(args.logdir)
    jax.block_until_ready(fwd(params, x + 99, c_noise, ctx, y, cond_mask))
    jax.profiler.stop_trace()

    xplane = glob.glob(f"{args.logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplane, flush=True)
    if not xplane:
        print("NO TRACE CAPTURED (remote device?)")
        return

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
        data = rtd.xspace_to_tool_data(
            xplane, "framework_op_stats", {"tqx": "out:json;"})
    except Exception as e:
        # the tensorboard summarizer breaks across TF/protobuf version bumps
        # (seen: missing _pywrap_profiler.xspace_to_tools_data, generated-
        # proto descriptor errors). The capture above already succeeded —
        # parse the xplane directly with the self-contained analyzer:
        print(f"tensorboard summarizer unavailable ({type(e).__name__}: {e});"
              f" analyze with:\n  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="
              f"python python tools/xprof.py {xplane[0]}")
        return
    payload = data[0] if isinstance(data, tuple) else data
    if isinstance(payload, bytes):
        payload = payload.decode()
    try:
        table = json.loads(payload[payload.index("{"):payload.rindex("}") + 1])
    except Exception:
        out_path = "/tmp/op_stats_raw.txt"
        with open(out_path, "w") as f:
            f.write(payload if isinstance(payload, str) else str(payload))
        print("could not parse, raw dumped to", out_path)
        return

    cols = [c["label"] for c in table["table"]["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in table["table"]["rows"]]
    print("columns:", cols)

    # typical columns: Type, Operation, #Occurrences, Total time (us),
    # Avg. time (us), Total self-time (us), ...
    self_col = next(i for i, c in enumerate(cols) if "self" in c.lower() and "us" in c.lower())
    op_col = next(i for i, c in enumerate(cols) if "operation" in c.lower())
    n_col = next((i for i, c in enumerate(cols) if "occurrence" in c.lower()), None)
    host_col = next((i for i, c in enumerate(cols) if "host" in c.lower() and "self" in c.lower()), None)

    dev_rows = [r for r in rows if host_col is None or not r[host_col]]
    total = sum(float(r[self_col] or 0) for r in dev_rows)
    dev_rows.sort(key=lambda r: -float(r[self_col] or 0))
    print(f"\ntotal self-time: {total/1e3:.1f} ms")
    print(f"{'self ms':>9} {'%':>5} {'n':>5}  op")
    for r in dev_rows[: args.top]:
        st = float(r[self_col] or 0)
        n = r[n_col] if n_col is not None else "?"
        print(f"{st/1e3:9.2f} {100*st/total:5.1f} {n:>5}  {str(r[op_col])[:110]}")


if __name__ == "__main__":
    main()
