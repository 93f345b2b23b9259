"""Host-side media writers: mp4 videos, PNG frames, image grids.

Counterpart of the reference's output writers (sample_utils.py:96-137,
train.py save_img_seq_to_video) — ffmpeg via imageio stays host-side.
Inputs are float arrays in [0, 1] (generated) or [-1, 1] (``real=True``),
NHWC.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _to_uint8(frames: np.ndarray, real: bool = False) -> np.ndarray:
    frames = np.asarray(frames, dtype=np.float32)
    if real:
        frames = (frames + 1.0) / 2.0
    return (np.clip(frames, 0.0, 1.0) * 255.0).astype(np.uint8)


def _encode_jpeg(frame: np.ndarray, quality: int = 90) -> bytes:
    """One RGB frame -> JPEG bytes: native libjpeg when built, else PIL."""
    from vista_tpu.data import native

    if native.encode_jpeg_available():
        return native.encode_jpeg(frame, quality)
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def save_video_avi_mjpeg(path: str, frames: np.ndarray, fps: int = 10,
                         real: bool = False, quality: int = 90) -> str:
    """Write ``(t, h, w, 3)`` frames as a Motion-JPEG AVI.

    A self-contained RIFF muxer — the deploy image has no ffmpeg, and
    MJPEG-in-AVI plays everywhere while compressing ~20x better than GIF.
    """
    import struct

    data = _to_uint8(frames, real)
    n, h, w, _ = data.shape
    jpegs = [_encode_jpeg(f, quality) for f in data]
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack("<14I", 1_000_000 // fps, max_size * fps, 0,
                       0x10,  # AVIF_HASINDEX
                       n, 0, 1, max_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, n, max_size, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b""
    index = b""
    for j in jpegs:
        offset = 4 + len(movi_payload)  # relative to the 'movi' fourcc
        movi_payload += chunk(b"00dc", j)
        index += b"00dc" + struct.pack("<III", 0x10, offset, len(j))
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(b"idx1", index)

    riff_payload = b"AVI " + hdrl + movi + idx1
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return path


def save_video_mp4(path: str, frames: np.ndarray, fps: int = 10, real: bool = False) -> str:
    """Write ``(t, h, w, 3)`` frames as a video at the reference's 10 fps.

    Tries mp4 via imageio/ffmpeg; without an ffmpeg backend (this deploy
    image) writes a Motion-JPEG AVI instead (returns the path written)."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = _to_uint8(frames, real)
    try:
        with imageio.get_writer(path, fps=fps) as w:
            for f in data:
                w.append_data(f)
        return path
    except Exception:
        avi_path = os.path.splitext(path)[0] + ".avi"
        return save_video_avi_mjpeg(avi_path, data, fps=fps)


def save_frames_png(dirpath: str, frames: np.ndarray, prefix: str = "frame",
                    real: bool = False) -> None:
    import imageio

    os.makedirs(dirpath, exist_ok=True)
    for i, f in enumerate(_to_uint8(frames, real)):
        imageio.imwrite(os.path.join(dirpath, f"{prefix}_{i:04d}.png"), f)


def save_grid_png(path: str, frames: np.ndarray, nrow: Optional[int] = None,
                  real: bool = False, pad: int = 2) -> None:
    """Tile ``(n, h, w, 3)`` into a grid PNG."""
    import imageio

    data = _to_uint8(frames, real)
    n, h, w, c = data.shape
    nrow = nrow or int(np.ceil(np.sqrt(n)))
    ncol = int(np.ceil(n / nrow))
    grid = np.zeros((ncol * (h + pad) - pad, nrow * (w + pad) - pad, c), np.uint8)
    for i, f in enumerate(data):
        r, col = divmod(i, nrow)
        grid[r * (h + pad): r * (h + pad) + h, col * (w + pad): col * (w + pad) + w] = f
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, grid)
