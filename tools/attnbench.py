"""Attention-primitive sweeps at Vista's full-res shapes (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained_time(fn, x, iters=5):
    import jax

    @jax.jit
    def chained(x):
        def body(x, _):
            return fn(x), None

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from vista_tpu.ops.attention import dot_product_attention

    # spatial level-0 at 576x1024, CFG-doubled: (50, 9216, 5, 64)
    q = jax.random.normal(jax.random.key(0), (50, 9216, 5, 64), jnp.bfloat16)
    for bq, bk in [(512, 512), (512, 1024), (1024, 512), (1024, 1024), (256, 2048)]:
        os.environ["VISTA_FLASH_BLOCK_Q"] = str(bq)
        os.environ["VISTA_FLASH_BLOCK_K"] = str(bk)
        import importlib
        import vista_tpu.ops.flash_attention as fa
        importlib.reload(fa)
        try:
            f = jax.jit(lambda x: fa.flash_attention(x, x, x))
            ms = chained_time(f, q) * 1000
            print(f"flash q{bq} k{bk}: {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"flash q{bq} k{bk}: failed {type(e).__name__}", flush=True)

    # temporal: (57600, 25, 5, 64)
    qt = jax.random.normal(jax.random.key(0), (57600, 25, 5, 64), jnp.bfloat16)
    f = jax.jit(lambda x: dot_product_attention(x, x, x, backend="xla"))
    print(f"temporal xla (new layout): {chained_time(f, qt)*1000:8.2f} ms", flush=True)

    def jnn(x):
        return jax.nn.dot_product_attention(x, x, x)

    try:
        print(f"temporal jax.nn:          {chained_time(jax.jit(jnn), qt)*1000:8.2f} ms", flush=True)
    except Exception as e:
        print("temporal jax.nn failed:", type(e).__name__, flush=True)

    # temporal folded to (BH, S, D) entirely outside
    def folded(x):
        b, s, h, d = x.shape
        xt = x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        logits = jnp.einsum("bqd,bkd->bqk", xt, xt, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * (d**-0.5), -1).astype(x.dtype)
        o = jnp.einsum("bqk,bkd->bqd", p, xt)
        return o.reshape(b, h, s, d).transpose(0, 2, 1, 3)

    print(f"temporal folded BH:       {chained_time(jax.jit(folded), qt)*1000:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
