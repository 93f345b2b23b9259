"""Component micro-benchmarks at full-res shapes (run on TPU).

Times the hot blocks of the 576x1024 denoise step in isolation so
optimization effort goes where the milliseconds are:
- VideoResBlock (spatial conv + temporal conv) at each level
- SpatialVideoTransformer (spatial attn + temporal attn) at each level
- the attention primitives alone (XLA vs Pallas flash) at level-0 shapes
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=5):
    """Time by chaining ``iters`` shape-preserving applications inside ONE
    compiled program (a lax.scan) — per-call host timing over the remote
    tunnel is unreliable."""
    import jax
    import jax.numpy as jnp

    # chain on the LAST argument if shape-preserving, else fall back to loop
    probe = fn(*args)
    chainable = hasattr(probe, "shape") and probe.shape == args[-1].shape if args else False

    if chainable:
        rest = args[:-1]

        @jax.jit
        def chained(*a):
            def body(x, _):
                return fn(*rest, x), None

            y, _ = jax.lax.scan(body, a[-1], None, length=iters)
            return y

        jax.block_until_ready(chained(*args))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(chained(*args))
        return (time.perf_counter() - t0) / iters

    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--frames", type=int, default=25)
    p.add_argument("--batch", type=int, default=50, help="frames in flight (CFG doubled)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vista_tpu.models.attention import SpatialVideoTransformer
    from vista_tpu.models.blocks import VideoResBlock
    from vista_tpu.ops.attention import dot_product_attention

    t = args.frames
    bt = args.batch
    hl, wl = args.height // 8, args.width // 8
    emb_ch = 1280
    results = {}

    # per-level shapes: (ds, h, w, ch)
    levels = [(1, hl, wl, 320), (2, hl // 2, wl // 2, 640), (4, hl // 4, wl // 4, 1280)]

    for ds, h, w, ch in levels:
        x = jnp.zeros((bt, h, w, ch), jnp.bfloat16)
        emb = jnp.zeros((bt, emb_ch), jnp.bfloat16)
        ctx = jnp.zeros((bt, 1, 1024), jnp.bfloat16)

        def record(name, fn, *a):
            try:
                results[name] = timeit(fn, *a)
            except Exception as e:
                results[name] = f"failed: {type(e).__name__}"
            print(name, results[name], flush=True)

        res = VideoResBlock(ch, emb_ch)
        rp = jax.jit(res.init, static_argnums=(3,))(jax.random.key(0), x, emb, t)
        record(f"resblock_ds{ds}", jax.jit(lambda p, e, x: res.apply(p, x, e, t)), rp, emb, x)

        backend = "pallas" if h * w >= 4096 else "xla"
        svt = SpatialVideoTransformer(channels=ch, heads=ch // 64, dim_head=64,
                                      context_dim=1024, backend=backend)
        sp = jax.jit(svt.init, static_argnums=(3,))(jax.random.key(0), x, ctx, t)
        record(f"transformer_ds{ds}", jax.jit(lambda p, c, x: svt.apply(p, x, c, t)), sp, ctx, x)

    # attention primitives at level-0 spatial shape
    s0 = hl * wl
    q = jax.random.normal(jax.random.key(0), (bt, s0, 5, 64), jnp.bfloat16)
    for backend in ["pallas"]:
        try:
            f = jax.jit(lambda q: dot_product_attention(q, q, q, backend=backend))
            results[f"spatial_attn_{backend}"] = timeit(f, q)
        except Exception as e:
            results[f"spatial_attn_{backend}"] = f"failed: {type(e).__name__}"
        print(f"spatial_attn_{backend}", results[f"spatial_attn_{backend}"], flush=True)

    # temporal attention primitive: (b*s, t, heads, d)
    rows = bt * s0
    chunk = rows
    while chunk > 65536 and chunk % 2 == 0:
        chunk //= 2
    qt = jax.random.normal(jax.random.key(0), (chunk, t, 5, 64), jnp.bfloat16)
    f = jax.jit(lambda q: dot_product_attention(q, q, q, backend="xla"))
    per_chunk = timeit(f, qt)
    results["temporal_attn_per_chunk"] = per_chunk
    results["temporal_attn_total(est)"] = per_chunk * (rows // chunk)

    for k, v in results.items():
        print(f"{k:30s} {v if isinstance(v, str) else f'{v*1000:9.2f} ms'}")


if __name__ == "__main__":
    main()
