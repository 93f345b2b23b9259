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


def save_video_mp4(path: str, frames: np.ndarray, fps: int = 10, real: bool = False) -> str:
    """Write ``(t, h, w, 3)`` frames to mp4 at the reference's 10 fps.

    Falls back to an animated GIF when no ffmpeg backend is installed
    (returns the path actually written)."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = _to_uint8(frames, real)
    try:
        with imageio.get_writer(path, fps=fps) as w:
            for f in data:
                w.append_data(f)
        return path
    except Exception:
        gif_path = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(gif_path, list(data), duration=1000.0 / fps, loop=0)
        return gif_path


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
