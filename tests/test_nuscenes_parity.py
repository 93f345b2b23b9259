"""NuScenes data semantics vs the torch reference, on the same anno list.

Pins the oversampling counts (balance_with_actions exceptions=[2,3],
resample_complete_samples validity predicate), the index-strided
``action_mod`` cycling, and the per-index emitted action keys against
``/root/reference/vwm/data/subsets/nuscenes.py`` exactly.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vista_tpu.data.datasets import (
    DatasetConfig,
    NuScenesDataset,
    balance_with_actions,
    resample_complete_samples,
)

REFERENCE_PATH = "/root/reference"


def _load_reference_nuscenes():
    # vwm/__init__.py pulls in the Lightning engine modules; reuse the
    # golden-parity stubs for the heavy deps
    import torch.nn as nn

    from tests.torch_ref import _stub

    _stub("pytorch_lightning", LightningModule=nn.Module, Callback=object,
          __version__="2.0.0")

    class _ListConfig(list):
        pass

    _stub("omegaconf", ListConfig=_ListConfig,
          OmegaConf=types.SimpleNamespace(), DictConfig=dict)
    _stub("kornia")
    _stub("open_clip", create_model_and_transforms=None)
    # stub torchvision (not installed); only transforms.Compose/ToTensor/
    # Lambda are referenced, and only at BaseDataset.__init__ time
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tr = types.ModuleType("torchvision.transforms")
        tr.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms", None)
        tr.Compose = lambda fns: (lambda x: x)
        tr.ToTensor = lambda: (lambda x: x)
        tr.Lambda = lambda f: f
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from vwm.data.subsets import nuscenes as ref_nuscenes

    return ref_nuscenes


def _annos():
    """A mix of complete, partial, empty-list, and invalid-goal samples."""
    mk = lambda cmd, speed, angle, z, goal: {
        "frames": [], "cmd": cmd, "traj": list(np.arange(10.0)),
        "speed": speed, "angle": angle, "z": z, "goal": goal,
    }
    return [
        mk(0, [1.0] * 5, [2.0] * 5, 1.0, [800, 450]),    # complete + rare cmd
        mk(2, [1.0] * 5, [2.0] * 5, 1.0, [800, 450]),    # complete, exception cmd
        mk(3, [], [2.0] * 5, 1.0, [800, 450]),           # empty speed
        mk(1, [1.0] * 5, [], 1.0, [800, 450]),           # empty angle
        mk(2, [1.0] * 5, [2.0] * 5, -1.0, [800, 450]),   # z <= 0
        mk(3, [1.0] * 5, [2.0] * 5, 1.0, [1600, 450]),   # goal x on edge
        mk(0, [1.0] * 5, [2.0] * 5, 1.0, [800, 0]),      # goal y invalid
        mk(1, [1.0] * 5, [2.0] * 5, 2.0, [1.0, 1.0]),    # complete + rare cmd
    ]


class TestOversampling:
    def test_counts_match_reference(self):
        ref = _load_reference_nuscenes()
        annos = _annos()
        ours_b = balance_with_actions([dict(a) for a in annos], increase_factor=5)
        ref_b = ref.balance_with_actions([dict(a) for a in annos], increase_factor=5)
        assert len(ours_b) == len(ref_b)
        assert [a["cmd"] for a in ours_b] == [a["cmd"] for a in ref_b]

        ours_r = resample_complete_samples(ours_b, increase_factor=2)
        ref_r = ref.resample_complete_samples(ref_b, increase_factor=2)
        assert len(ours_r) == len(ref_r)
        assert [a["cmd"] for a in ours_r] == [a["cmd"] for a in ref_r]

    def test_exception_commands_not_oversampled(self):
        annos = _annos()
        out = balance_with_actions(annos, increase_factor=5)
        added = out[len(annos):]
        assert all(a["cmd"] not in (2, 3) for a in added)
        # every non-exception sample gets exactly 4 extra copies
        rare = [a for a in annos if a["cmd"] not in (2, 3)]
        assert len(added) == 4 * len(rare)


class TestActionModCycling:
    def _ref_dataset(self, annos):
        ref = _load_reference_nuscenes()
        ds = object.__new__(ref.NuScenesDataset)   # skip file-system __init__
        ds.samples = annos
        ds.action_mod = 0
        return ds

    def _ref_keys(self, ds, index):
        # reference __getitem__ semantics without image IO
        # (nuscenes.py:85-93: update action_mod, then build_data_dict)
        ds.action_mod = (ds.action_mod + index) % 4
        img = [torch.zeros(3, 4, 4)]
        d = ds.build_data_dict(img, ds.samples[index])
        base = {"img_seq", "motion_bucket_id", "fps_id",
                "cond_frames_without_noise", "cond_frames", "cond_aug"}
        return set(d.keys()) - base

    def test_per_index_action_keys_match(self):
        annos = _annos()
        ref_ds = self._ref_dataset(annos)
        ours = object.__new__(NuScenesDataset)
        ours.cfg = DatasetConfig()
        ours.annos = annos
        ours._action_mod = 0

        key_map = {"trajectory": "trajectory", "command": "command",
                   "speed": "speed", "angle": "angle", "goal": "goal"}
        for index in range(len(annos)):
            ref_keys = self._ref_keys(ref_ds, index)
            our_keys = set(ours.action_dict(annos[index], index).keys())
            assert our_keys == {key_map[k] for k in ref_keys}, (
                f"index {index}: ours {our_keys} vs reference {ref_keys}")
            assert ours._action_mod == ref_ds.action_mod

    def test_values_match_reference(self):
        annos = _annos()
        ref_ds = self._ref_dataset(annos)
        ours = object.__new__(NuScenesDataset)
        ours.cfg = DatasetConfig()
        ours.annos = annos
        ours._action_mod = 0
        for index in range(len(annos)):
            ref_ds.action_mod = (ref_ds.action_mod + index) % 4
            d = ref_ds.build_data_dict([torch.zeros(3, 4, 4)], annos[index])
            o = ours.action_dict(annos[index], index)
            for k in ("trajectory", "command", "speed", "angle", "goal"):
                if k in o:
                    np.testing.assert_allclose(
                        o[k], np.asarray(d[k], np.float32).reshape(o[k].shape),
                        atol=1e-6, err_msg=f"index {index} key {k}")
                else:
                    assert k not in d, f"index {index}: reference emits {k}"
