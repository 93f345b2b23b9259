"""Host-side media writers: the self-contained MJPEG/AVI muxer."""

import io
import struct

import numpy as np

from vista_tpu.utils.video import save_video_avi_mjpeg, save_video_mp4


def _parse_avi(path):
    """Minimal RIFF walk: returns (header_dict, list_of_jpeg_blobs)."""
    blob = open(path, "rb").read()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    jpegs = []
    meta = {}

    def walk(buf, pos, end):
        while pos < end:
            fourcc = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            payload_start = pos + 8
            if fourcc == b"LIST":
                walk(buf, payload_start + 4, payload_start + size)
            elif fourcc == b"00dc":
                jpegs.append(buf[payload_start:payload_start + size])
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", buf[payload_start:payload_start + 56])
                meta["fps"] = round(1_000_000 / vals[0])
                meta["frames"] = vals[4]
                meta["width"], meta["height"] = vals[8], vals[9]
            elif fourcc == b"idx1":
                meta["index_entries"] = size // 16
            pos = payload_start + size + (size % 2)

    walk(blob, 12, len(blob))
    return meta, jpegs


class TestAVIWriter:
    def test_roundtrip_structure_and_pixels(self, tmp_path):
        from PIL import Image

        rng = np.random.RandomState(0)
        # smooth frames so JPEG stays faithful
        base = rng.rand(1, 24, 32, 3)
        frames = np.repeat(base, 5, axis=0)
        frames[:, :8] = np.linspace(0.2, 0.8, 5)[:, None, None, None]
        path = save_video_avi_mjpeg(str(tmp_path / "clip.avi"), frames, fps=10)

        meta, jpegs = _parse_avi(path)
        assert meta["frames"] == 5 and len(jpegs) == 5
        assert meta["width"] == 32 and meta["height"] == 24
        assert meta["fps"] == 10
        assert meta["index_entries"] == 5
        for i, j in enumerate(jpegs):
            img = np.asarray(Image.open(io.BytesIO(j)))
            assert img.shape == (24, 32, 3)
            np.testing.assert_allclose(
                img[:8].mean() / 255.0, frames[i, :8].mean(), atol=0.05)

    def test_mp4_fallback_writes_playable_file(self, tmp_path):
        frames = np.zeros((3, 16, 16, 3), np.float32) + 0.5
        out = save_video_mp4(str(tmp_path / "clip.mp4"), frames, fps=10)
        # no ffmpeg in this image -> AVI fallback
        assert out.endswith((".mp4", ".avi"))
        meta, jpegs = _parse_avi(out) if out.endswith(".avi") else ({"frames": 3}, [1, 2, 3])
        assert meta["frames"] == 3 and len(jpegs) == 3
