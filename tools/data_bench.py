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
    p.add_argument("--pipeline", action="store_true",
                   help="end-to-end sustained throughput THROUGH "
                        "data/pipeline.py (dataset sampling + threaded "
                        "decode + prefetch queue) from an on-disk synthetic "
                        "frame folder, instead of the per-batch decode "
                        "microbench — the number that answers 'can the host "
                        "feed N chips' (BASELINE.md host-pipeline table)")
    p.add_argument("--seconds", type=float, default=20.0,
                   help="--pipeline measurement window")
    p.add_argument("--frames", type=int, default=25,
                   help="--pipeline clip length")
    args = p.parse_args()

    if args.pipeline:
        return pipeline_bench(args)

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


def pipeline_bench(args):
    """Sustained frames/s through the real input pipeline (round-4 verdict
    item #7): synthetic camera-resolution JPEGs on disk -> YouTubeFramesDataset
    (native libjpeg+Lanczos decode) -> MultiSourceSampler -> DataPipeline's
    worker threads + bounded prefetch queue -> consumer loop. Reports the
    cores-per-chip requirement against the measured training demand."""
    import json
    import tempfile

    from PIL import Image

    from vista_tpu.data.datasets import DatasetConfig, YouTubeFramesDataset
    from vista_tpu.data.pipeline import DataPipeline, MultiSourceSampler, PipelineConfig

    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (args.src_height // 8, args.src_width // 8, 3),
                       np.uint8)
    frame = np.asarray(Image.fromarray(base).resize(
        (args.src_width, args.src_height), Image.BILINEAR), np.uint8)

    with tempfile.TemporaryDirectory() as root:
        folder = os.path.join(root, "video0")
        os.makedirs(folder)
        n_files = args.frames + 15
        for i in range(1, n_files + 1):
            Image.fromarray(np.roll(frame, i * 7, axis=1)).save(
                os.path.join(folder, str(i).zfill(9) + ".jpg"), quality=90)
        annos = [{"folder": "video0", "first_frame": k} for k in range(1, 16)]
        anno_file = os.path.join(root, "anno.json")
        with open(anno_file, "w") as f:
            json.dump(annos, f)

        ds = YouTubeFramesDataset(DatasetConfig(
            anno_file=anno_file, data_root=root, height=args.height,
            width=args.width, num_frames=args.frames))
        pipe = DataPipeline(
            MultiSourceSampler([ds], seed=0),
            PipelineConfig(batch_size=1, prefetch=4, num_threads=args.threads))
        it = iter(pipe)
        next(it)  # warm-up: thread spawn + first decode
        t0 = time.perf_counter()
        batches = 0
        while time.perf_counter() - t0 < args.seconds:
            next(it)
            batches += 1
        elapsed = time.perf_counter() - t0
        pipe.stop()

    fps = batches * args.frames / elapsed
    # measured training demand (PARITY.md round-4 table, BASELINE #5):
    # 0.861 steps/s x 25 frames at 320x576 on one v5e chip
    demand = 0.861 * 25
    host_cores = os.cpu_count() or 1
    print(json.dumps({
        "metric": f"host pipeline sustained frames/s ({args.src_width}x"
                  f"{args.src_height} JPEG -> {args.width}x{args.height}, "
                  f"{args.frames}f clips, {args.threads} threads, "
                  f"{host_cores}-core host)",
        "sustained_frames_per_s": round(fps, 1),
        "frames_per_s_per_core": round(fps / host_cores, 1),
        "train_demand_frames_per_s_per_chip": round(demand, 1),
        "chips_fed_per_host_core": round(fps / host_cores / demand, 2),
        "cores_needed_per_chip": round(demand / (fps / host_cores), 2),
    }))


if __name__ == "__main__":
    main()
