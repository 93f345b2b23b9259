"""Load the PyTorch reference modules (read-only) for golden-parity tests.

Stubs the reference's unavailable heavy deps (pytorch_lightning, omegaconf,
kornia, open_clip) so that only the pure-torch network modules import. Used
to generate golden activations that pin our Flax ports to the reference math
(SURVEY.md §4 "golden parity"). The reference falls back to its torch-SDPA
attention when xformers is absent, which is numerically equivalent.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Import and return the reference torch modules (vwm.*)."""
    import torch.nn as nn

    _stub("pytorch_lightning", LightningModule=nn.Module, Callback=object,
          __version__="2.0.0")

    class _ListConfig(list):
        pass

    _stub("omegaconf", ListConfig=_ListConfig, OmegaConf=types.SimpleNamespace(), DictConfig=dict)
    _stub("kornia")
    _stub("kornia.geometry")
    _stub("kornia.enhance")
    _stub("open_clip", create_model_and_transforms=None)

    # xformers stub: lets the reference's `softmax-xformers` mode run —
    # MemoryEfficientCrossAttention is the only impl carrying the LoRA and
    # action-control adapters (attention.py:294-353), so the finetuning-path
    # golden tests need it. memory_efficient_attention on (b*h, s, d) inputs
    # is numerically torch SDPA with default scale.
    import torch.nn.functional as F

    def _mea(q, k, v, attn_bias=None, op=None):
        assert attn_bias is None, "stub supports the non-causal path only"
        return F.scaled_dot_product_attention(q, k, v)

    import importlib.machinery

    xf = _stub("xformers")
    xf.__spec__ = importlib.machinery.ModuleSpec("xformers", None)
    xf.ops = _stub("xformers.ops", memory_efficient_attention=_mea,
                   LowerTriangularMask=object)

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    from vwm.modules.diffusionmodules import video_model, model as vae_model
    from vwm.modules.autoencoding import temporal_ae
    from vwm.modules.encoders import modules as encoders
    from vwm.models import autoencoder

    return types.SimpleNamespace(
        video_model=video_model, vae_model=vae_model, temporal_ae=temporal_ae,
        encoders=encoders, autoencoder=autoencoder)
