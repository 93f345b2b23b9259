"""Build the native host library and pin the native-vs-PIL decode parity.

The C++ input pipeline (native/vista_host.cpp: libjpeg decode + center-crop +
Lanczos3 + [-1,1] normalize, reference counterpart subsets/common.py:34-51)
is an optional fast path — ``data/native.py`` falls back to PIL when the .so
is absent. That makes a silent toolchain regression possible: nothing would
fail, the loader would just get slower and (worse) could drift numerically.
This test builds the library from source and asserts the parity bound that
``tools/data_bench.py`` relies on, so the 1.4x/core claim stays checkable.
"""

import io
import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_DIR = os.path.join(REPO, "native")


@pytest.fixture(scope="module")
def native_lib():
    from vista_tpu.data import native

    if not native.available():
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("no native toolchain (make/g++) available")
        build = subprocess.run(["make", "-C", NATIVE_DIR],
                               capture_output=True, text=True)
        if build.returncode != 0:
            pytest.skip(f"native build failed: {build.stderr[-500:]}")
        # the module caches the failed load attempt; reset it
        native._TRIED = False
        native._LIB = None
    if not native.available():
        pytest.skip("libvista_host.so missing after build")
    return native


def _synthetic_jpeg(rng, src_w=640, src_h=360, quality=90):
    from PIL import Image

    base = rng.randint(0, 255, (src_h // 8, src_w // 8, 3), np.uint8)
    frame = Image.fromarray(base).resize((src_w, src_h), Image.BILINEAR)
    buf = io.BytesIO()
    frame.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


class TestNativeHostParity:
    def test_decode_batch_matches_pil(self, native_lib):
        from PIL import Image

        from vista_tpu.data.datasets import center_crop_resize

        rng = np.random.RandomState(0)
        blobs = [_synthetic_jpeg(rng) for _ in range(4)]
        h, w = 160, 288
        out_n = native_lib.process_jpeg_batch(blobs, h, w, threads=2)
        out_p = np.stack([
            center_crop_resize(Image.open(io.BytesIO(b)), h, w) for b in blobs])
        assert out_n.shape == out_p.shape == (4, h, w, 3)
        assert out_n.dtype == np.float32
        assert float(out_n.min()) >= -1.0 and float(out_n.max()) <= 1.0
        # same crop geometry + Lanczos3; JPEG IDCT and resampler impls differ
        # slightly — the bound data_bench.py asserts
        err = float(np.abs(out_n - out_p).mean())
        assert err < 0.03, f"native/PIL disagree: mean abs err {err}"

    def test_crop_resize_normalize_matches_pil(self, native_lib):
        from vista_tpu.data.datasets import center_crop_resize

        rng = np.random.RandomState(1)
        # no JPEG in the loop: isolates the crop/resample/normalize parity
        rgb = rng.randint(0, 255, (90, 160, 3), np.uint8)
        out_n = native_lib.crop_resize_normalize(rgb, 40, 72)
        out_p = center_crop_resize(rgb, 40, 72)
        err = float(np.abs(out_n - out_p).mean())
        assert err < 0.02, f"resampler-only parity broke: mean abs err {err}"

    def test_jpeg_encode_roundtrip(self, native_lib):
        if not native_lib.encode_jpeg_available():
            pytest.skip("built .so lacks vh_encode_jpeg")
        # smooth gradient: JPEG-friendly content (random blocks hit ~7.6 mean
        # error at q95 — chroma subsampling, not an encoder bug)
        yy, xx = np.mgrid[0:64, 0:64]
        rgb = np.stack([yy * 4, xx * 4, (yy + xx) * 2], -1).astype(np.uint8)
        blob = native_lib.encode_jpeg(rgb, quality=95)
        assert blob[:2] == b"\xff\xd8"  # JPEG SOI marker
        from PIL import Image

        back = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"), np.int16)
        assert back.shape == rgb.shape
        assert float(np.abs(back - rgb.astype(np.int16)).mean()) < 6.0
