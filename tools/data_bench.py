"""Host input-pipeline throughput: native C++ path vs the PIL fallback.

The training loop consumes ~20 frames/s/chip at 320x576 (BASELINE #5:
0.81 steps/s x 25 frames), so the host pipeline must sustain at least that
per chip — the reference feeds its loaders from the same kind of JPEG frame
folders (vwm/data/subsets/common.py:10-51). Measures JPEG decode +
center-crop + Lanczos3 + [-1,1] normalize end-to-end on synthetic
driving-camera-sized JPEGs (1600x900, the nuScenes camera resolution).

Usage: python tools/data_bench.py [--n 64 --height 320 --width 576]
"""

import argparse
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--src-width", type=int, default=1600)
    p.add_argument("--src-height", type=int, default=900)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from PIL import Image

    from vista_tpu.data import native
    from vista_tpu.data.datasets import center_crop_resize

    rng = np.random.RandomState(0)
    # smooth-ish synthetic frames so JPEG sizes resemble camera footage
    base = rng.randint(0, 255, (args.src_height // 8, args.src_width // 8, 3),
                       np.uint8)
    frame = np.asarray(Image.fromarray(base).resize(
        (args.src_width, args.src_height), Image.BILINEAR), np.uint8)
    blobs = []
    for i in range(args.n):
        buf = io.BytesIO()
        Image.fromarray(np.roll(frame, i * 7, axis=1)).save(
            buf, "JPEG", quality=90)
        blobs.append(buf.getvalue())
    kb = sum(len(b) for b in blobs) / len(blobs) / 1024

    def timeit(fn):
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return args.n / best

    results = {}
    if native.available():
        out_n = native.process_jpeg_batch(blobs, args.height, args.width,
                                          threads=args.threads)
        results["native_imgs_per_s"] = round(timeit(
            lambda: native.process_jpeg_batch(blobs, args.height, args.width,
                                              threads=args.threads)), 1)
    else:
        out_n = None
        results["native_imgs_per_s"] = None

    def pil_batch():
        return np.stack([
            center_crop_resize(Image.open(io.BytesIO(b)), args.height, args.width)
            for b in blobs])

    out_p = pil_batch()
    results["pil_imgs_per_s"] = round(timeit(pil_batch), 1)

    if out_n is not None:
        # same crop geometry + Lanczos: paths must agree closely (JPEG decode
        # and resampler implementations differ slightly)
        err = float(np.abs(out_n - out_p).mean())
        results["native_vs_pil_mean_abs_err"] = round(err, 4)
        assert out_n.shape == out_p.shape == (args.n, args.height, args.width, 3)
        assert err < 0.03, f"native/PIL disagree: {err}"

    print(json.dumps({
        "metric": f"host pipeline imgs/sec ({args.src_width}x{args.src_height} "
                  f"JPEG ~{kb:.0f}KB -> {args.width}x{args.height}, "
                  f"{args.threads} threads)",
        **results,
        "train_consumption_imgs_per_s_per_chip": 20.3,
    }))


if __name__ == "__main__":
    main()
