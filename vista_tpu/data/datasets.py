"""Host-side datasets: frame loading, crop/resize, action annotations.

Behavioral counterpart of ``vwm/data`` (SURVEY.md §2.6):

- ``BaseVideoDataset`` (subsets/common.py): JSON annotation list; per frame
  center-crop to the target aspect ratio, LANCZOS resize (dims must be
  multiples of 64 at full res), scale to [-1, 1]; emits the conditioning
  scalars (motion_bucket_id 127, fps_id 9, cond_aug) alongside the frames;
- ``YouTubeFramesDataset`` (subsets/youtube.py): zero-padded numbered frame
  files per folder, anno gives the first frame index;
- ``NuScenesDataset`` (subsets/nuscenes.py): action-annotated samples with a
  cycling ``action_mod`` picking one of 4 modalities per sample
  (traj / command / speed+angle / goal), command-balancing and
  complete-sample oversampling;
- ``SyntheticVideoDataset``: deterministic random clips for tests/benches.

Outputs are numpy (host) — the pipeline feeds device via ``device_put``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    anno_file: str = ""
    data_root: str = ""
    height: int = 320
    width: int = 576
    num_frames: int = 25
    fps_id: float = 9.0
    motion_bucket_id: float = 127.0
    cond_aug: float = 0.0


def center_crop_resize(img, target_h: int, target_w: int) -> np.ndarray:
    """Center-crop to the target aspect then LANCZOS-resize; [-1, 1] float32.

    Mirrors subsets/common.py:34-51 (crop the longer side, LANCZOS resample).
    """
    from PIL import Image

    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    w, h = img.size
    target_aspect = target_w / target_h
    aspect = w / h
    if aspect > target_aspect:  # too wide: crop width
        new_w = int(round(h * target_aspect))
        x0 = (w - new_w) // 2
        img = img.crop((x0, 0, x0 + new_w, h))
    elif aspect < target_aspect:  # too tall: crop height
        new_h = int(round(w / target_aspect))
        y0 = (h - new_h) // 2
        img = img.crop((0, y0, w, y0 + new_h))
    img = img.resize((target_w, target_h), Image.LANCZOS)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    return arr[..., :3] * 2.0 - 1.0


class BaseVideoDataset:
    """JSON-annotated frame-sequence dataset."""

    def __init__(self, cfg: DatasetConfig):
        self.cfg = cfg
        self.annos: List[Dict] = []
        if cfg.anno_file and os.path.exists(cfg.anno_file):
            with open(cfg.anno_file) as f:
                self.annos = json.load(f)

    def __len__(self) -> int:
        return len(self.annos)

    def frame_paths(self, anno: Dict) -> List[str]:
        raise NotImplementedError

    def action_dict(self, anno: Dict, index: int) -> Dict[str, np.ndarray]:
        return {}

    def _load_frames(self, paths: List[str]) -> np.ndarray:
        cfg = self.cfg
        # native path: threaded libjpeg decode + Lanczos off the GIL
        if all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
            from vista_tpu.data import native

            if native.available():
                return native.load_frame_batch(paths, cfg.height, cfg.width)
        from PIL import Image

        frames = []
        for p in paths:
            with Image.open(p) as img:
                frames.append(center_crop_resize(img.convert("RGB"), cfg.height, cfg.width))
        return np.stack(frames)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        anno = self.annos[index % max(len(self.annos), 1)]
        seq = self._load_frames(self.frame_paths(anno)[: cfg.num_frames])  # (t, h, w, 3)
        out = {
            "frames": seq,
            "fps_id": np.float32(cfg.fps_id),
            "motion_bucket_id": np.float32(cfg.motion_bucket_id),
            "cond_aug": np.float32(cfg.cond_aug),
        }
        out.update(self.action_dict(anno, index))
        return out


class YouTubeFramesDataset(BaseVideoDataset):
    """OpenDV-style: frames as zero-padded numbered images in per-video folders."""

    def __init__(self, cfg: DatasetConfig, pad_width: int = 9, ext: str = ".jpg"):
        super().__init__(cfg)
        self.pad_width = pad_width
        self.ext = ext

    def frame_paths(self, anno: Dict) -> List[str]:
        folder = os.path.join(self.cfg.data_root, anno["folder"])
        first = int(anno["first_frame"])
        return [
            os.path.join(folder, str(first + i).zfill(self.pad_width) + self.ext)
            for i in range(self.cfg.num_frames)
        ]


# nuScenes command ids NOT oversampled — everything else is rare
# (subsets/nuscenes.py:8-17: `if cmd not in exceptions`, exceptions=[2, 3])
_COMMAND_EXCEPTIONS = (2, 3)


def _goal_valid(anno: Dict) -> bool:
    """The reference's completeness predicate (subsets/nuscenes.py:20-28,73-79):
    a usable goal point needs z > 0 and the pixel coordinates strictly inside
    the 1600x900 camera frame."""
    goal = anno.get("goal") or (0, 0)
    return (anno.get("z", 0) > 0
            and 0 < goal[0] < 1600 and 0 < goal[1] < 900)


def balance_with_actions(annos: List[Dict], increase_factor: int = 5,
                         exceptions: Sequence[int] = _COMMAND_EXCEPTIONS) -> List[Dict]:
    """Oversample every sample whose command is NOT in ``exceptions`` by
    ``increase_factor`` (subsets/nuscenes.py:8-17; appended copies keep the
    reference's ordering: originals first, then the extras)."""
    extra = [a for a in annos if a.get("cmd") not in exceptions
             for _ in range(increase_factor - 1)]
    return annos + extra


def resample_complete_samples(annos: List[Dict], increase_factor: int = 2) -> List[Dict]:
    """Oversample samples with non-empty speed AND angle AND a valid goal
    point (subsets/nuscenes.py:20-28)."""
    extra = [a for a in annos
             if a.get("speed") and a.get("angle") and _goal_valid(a)
             for _ in range(increase_factor - 1)]
    return annos + extra


class NuScenesDataset(BaseVideoDataset):
    """Action-annotated nuScenes clips with per-sample modality cycling.

    Each __getitem__ emits ONE of four action conditioning sets; the modality
    counter advances by the sample index per call — ``action_mod = (action_mod
    + index) % 4`` — exactly as the reference (subsets/nuscenes.py:86):
      0: trajectory (8 floats, traj[2:])
      1: command (1)
      2: speed (4, speed[1:]) if non-empty + angle (4, angle[1:]/780) if non-empty
      3: goal (2, normalized by 1600x900) ONLY when the point is valid
         (z > 0, coords inside the frame) — otherwise omitted and the
         conditioner zero-fills (subsets/nuscenes.py:73-79)
    """

    def __init__(self, cfg: DatasetConfig, balance: bool = True,
                 oversample_complete: bool = True):
        super().__init__(cfg)
        if balance and self.annos:
            self.annos = balance_with_actions(self.annos, increase_factor=5)
        if oversample_complete and self.annos:
            self.annos = resample_complete_samples(self.annos, increase_factor=2)
        self._action_mod = 0

    def frame_paths(self, anno: Dict) -> List[str]:
        return [os.path.join(self.cfg.data_root, p) for p in anno["frames"]]

    def action_dict(self, anno: Dict, index: int) -> Dict[str, np.ndarray]:
        # stateful index-stride cycling, reference nuscenes.py:86 (the update
        # happens BEFORE the modality dispatch and uses the updated value)
        self._action_mod = (self._action_mod + index) % 4
        mod = self._action_mod
        out: Dict[str, np.ndarray] = {}
        if mod == 0 and "traj" in anno:
            out["trajectory"] = np.asarray(anno["traj"][2:10], np.float32)
        elif mod == 1 and "cmd" in anno:
            out["command"] = np.asarray([anno["cmd"]], np.float32)
        elif mod == 2:
            # the two gates are independent; empty lists are omitted
            # (nuscenes.py:66-72 "scene might be empty")
            if anno.get("speed"):
                out["speed"] = np.asarray(anno["speed"][1:5], np.float32)
            if anno.get("angle"):
                out["angle"] = np.asarray(anno["angle"][1:5], np.float32) / 780.0
        elif mod == 3 and _goal_valid(anno):
            out["goal"] = np.asarray(
                [anno["goal"][0] / 1600.0, anno["goal"][1] / 900.0], np.float32)
        return out


class SyntheticVideoDataset(BaseVideoDataset):
    """Deterministic random clips — tests, benchmarks, smoke training."""

    def __init__(self, cfg: DatasetConfig, length: int = 64, with_actions: bool = False):
        self.cfg = cfg
        self.length = length
        self.with_actions = with_actions
        self.annos = [{} for _ in range(length)]

    def __len__(self):
        return self.length

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = np.random.RandomState(index)
        out = {
            "frames": rng.randn(cfg.num_frames, cfg.height, cfg.width, 3).astype(np.float32) * 0.3,
            "fps_id": np.float32(cfg.fps_id),
            "motion_bucket_id": np.float32(cfg.motion_bucket_id),
            "cond_aug": np.float32(cfg.cond_aug),
        }
        if self.with_actions:
            out["trajectory"] = rng.randn(8).astype(np.float32)
        return out
