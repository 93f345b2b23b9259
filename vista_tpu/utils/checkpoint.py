"""Checkpoint IO: Orbax (native, sharded, async) + safetensors interop.

Replaces the reference's multi-format checkpoint zoo — Lightning ``.ckpt``,
DeepSpeed partitioned ``.bin`` + ``zero_to_fp32.py`` merge + ``bin_to_st.py``
LoRA/EMA rewriting (SURVEY.md §5.4) — with:

- ONE native format: an Orbax checkpoint of the TrainState pytree (params,
  optimizer state, EMA as a plain sibling pytree, step). Sharded arrays save
  and restore directly; there is no per-rank partition merging.
- safetensors import for the released ``vista.safetensors`` /
  ``svd_xt.safetensors`` weights (and export back for interchange), via the
  explicit key maps in ``vista_tpu/utils/torch_import.py``.

SVD-XT init replication (train.py:644-646): when a checkpoint lacks
``cond_time_stack_embed`` weights they are duplicated from ``time_embed``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from vista_tpu.engine.engine import EngineConfig
from vista_tpu.utils import torch_import as ti

# torch-side prefixes in the released checkpoints
UNET_PREFIX = "model.diffusion_model."
ENC_PREFIX = "first_stage_model.encoder."
DEC_PREFIX = "first_stage_model.decoder."
CLIP_PREFIX = "conditioner.embedders.0.open_clip.model.visual."
COND_VAE_PREFIX = "conditioner.embedders.3.encoder.encoder."
COND_QUANT_PREFIX = "conditioner.embedders.3.encoder.quant_conv"


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def import_vista_checkpoint(
    state_dict: Dict[str, np.ndarray],
    cfg: EngineConfig,
    strict: bool = True,
) -> Dict:
    """Build the engine param pytree from a reference-format state_dict."""
    sd = dict(state_dict)
    # DeepSpeed prefix fixup (bin_to_st.py:33-36 / diffusion.py:112-131)
    sd = {k.removeprefix("_forward_module."): v for k, v in sd.items()}

    # SVD-XT ships without cond_time_stack_embed: duplicate from time_embed
    for i in (0, 2):
        src = f"{UNET_PREFIX}time_embed.{i}"
        dst = f"{UNET_PREFIX}cond_time_stack_embed.{i}"
        for suffix in (".weight", ".bias"):
            if src + suffix in sd and dst + suffix not in sd:
                sd[dst + suffix] = sd[src + suffix]

    params: Dict = {}
    params["unet"] = ti.apply_key_map(sd, ti.unet_key_map(cfg.unet), UNET_PREFIX, strict)
    params["encoder"] = ti.apply_key_map(sd, ti.vae_encoder_key_map(cfg.vae), ENC_PREFIX, strict)
    params["decoder"] = ti.apply_key_map(
        sd, ti.vae_decoder_key_map(cfg.vae, video=True), DEC_PREFIX, strict)

    conditioner: Dict = {}
    conditioner["clip_tower"] = ti.apply_key_map(
        sd, ti.clip_key_map(cfg.conditioner.clip), CLIP_PREFIX, strict)
    conditioner["cond_frames_encoder"] = ti.apply_key_map(
        sd, ti.vae_encoder_key_map(cfg.conditioner.vae), COND_VAE_PREFIX, strict)
    qk, qb = COND_QUANT_PREFIX + ".weight", COND_QUANT_PREFIX + ".bias"
    if qk in sd:
        conditioner["quant_conv"] = {
            "kernel": np.ascontiguousarray(np.asarray(sd[qk], np.float32).transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[qb], np.float32),
        }
    elif strict:
        raise KeyError(f"missing {qk}")
    params["conditioner"] = conditioner
    return params


def export_vista_checkpoint(params: Dict, cfg: EngineConfig) -> Dict[str, np.ndarray]:
    """Inverse of import: produce a reference-layout state_dict (interchange)."""
    sd: Dict[str, np.ndarray] = {}
    sd.update(ti.export_key_map(params["unet"], ti.unet_key_map(cfg.unet), UNET_PREFIX))
    sd.update(ti.export_key_map(params["encoder"], ti.vae_encoder_key_map(cfg.vae), ENC_PREFIX))
    sd.update(ti.export_key_map(
        params["decoder"], ti.vae_decoder_key_map(cfg.vae, video=True), DEC_PREFIX))
    cond = params["conditioner"]
    sd.update(ti.export_key_map(cond["clip_tower"], ti.clip_key_map(cfg.conditioner.clip), CLIP_PREFIX))
    sd.update(ti.export_key_map(
        cond["cond_frames_encoder"], ti.vae_encoder_key_map(cfg.conditioner.vae), COND_VAE_PREFIX))
    if "quant_conv" in cond:
        sd[COND_QUANT_PREFIX + ".weight"] = np.ascontiguousarray(
            np.asarray(cond["quant_conv"]["kernel"], np.float32).transpose(3, 2, 0, 1))
        sd[COND_QUANT_PREFIX + ".bias"] = np.asarray(cond["quant_conv"]["bias"], np.float32)
    return sd


def save_safetensors(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    from safetensors.numpy import save_file

    save_file(state_dict, path)


# ---------------- Orbax native checkpoints ----------------

def save_checkpoint(path: str, tree, step: Optional[int] = None) -> None:
    """Save a pytree (e.g. TrainState) as an Orbax checkpoint."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_checkpoint(path: str, target=None):
    """Restore a pytree; ``target`` (matching structure) enables sharded restore."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-pickle checkpoint (DeepSpeed-merged ``pytorch_model.bin``)
    as a flat numpy state_dict (bin_to_st.py:8 ``torch.load(map_location=cpu)``).

    Accepts either a bare state_dict or a wrapper with a ``state_dict`` /
    ``module`` entry (zero_to_fp32.py emits the bare form)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "module"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k: np.asarray(v.detach().numpy()) for k, v in obj.items()}


def bin_to_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """The reference ``bin_to_st.py`` conversion, pass for pass: merge LoRA
    adapters into base weights, strip the DeepSpeed ``_forward_module.``
    prefix, then replace online weights with their ``model_ema`` shadows.

    Reproduces the reference exactly (bin_to_st.py:10-47):
    - LoRA merge BEFORE the prefix strip, on both online and EMA copies; the
      EMA target for the out projection is the name-mangled ``to_out0``
      (LitEma strips dots from parameter names, ema.py:26-28) while the
      online target is ``to_out.0``;
    - the prefix pass keeps ONLY ``_forward_module.*`` keys (minus the EMA
      ``decay``/``num_updates`` counters) — the ``del`` is unconditional in
      the reference. When no key carries the prefix (an already-clean dict)
      all keys are kept instead, minus the counters;
    - the EMA pass matches ``model_ema.<mangled>`` to the online key via
      ``k[10:] == kk[6:].replace('.', '')`` (bin_to_st.py:38-47).
    """
    out = dict(sd)

    # pass 1: LoRA merge (bin_to_st.py:10-31)
    for k in list(out.keys()):
        if "adapter_down" not in k:
            continue
        if "q_adapter_down" in k:
            up_k = k.replace("q_adapter_down", "q_adapter_up")
            pretrain_k = k.replace("q_adapter_down", "to_q")
        elif "k_adapter_down" in k:
            up_k = k.replace("k_adapter_down", "k_adapter_up")
            pretrain_k = k.replace("k_adapter_down", "to_k")
        elif "v_adapter_down" in k:
            up_k = k.replace("v_adapter_down", "v_adapter_up")
            pretrain_k = k.replace("v_adapter_down", "to_v")
        else:
            up_k = k.replace("out_adapter_down", "out_adapter_up")
            if "model_ema" in k:
                pretrain_k = k.replace("out_adapter_down", "to_out0")
            else:
                pretrain_k = k.replace("out_adapter_down", "to_out.0")
        lora = out[up_k] @ out[k]
        del out[k], out[up_k]
        out[pretrain_k] = out[pretrain_k] + lora

    # pass 2: prefix strip (bin_to_st.py:33-36; the del is unconditional —
    # only prefixed keys survive). Clean dicts skip the filter.
    if any("_forward_module" in k for k in out):
        out = {k.replace("_forward_module.", ""): v for k, v in out.items()
               if "_forward_module" in k and "decay" not in k
               and "num_updates" not in k}
    else:
        out = {k: v for k, v in out.items()
               if not ("model_ema" in k
                       and ("decay" in k or "num_updates" in k))}

    # pass 3: model_ema -> online swap (bin_to_st.py:38-47). The reference
    # scans all non-EMA keys for each EMA key; a reverse map of the same
    # match (last writer wins, like the reference's loop) is O(N).
    mangled = {kk[6:].replace(".", ""): kk for kk in out
               if "model_ema" not in kk}
    for k in list(out.keys()):
        if "model_ema" not in k:
            continue
        orig_k = mangled.get(k[10:])
        assert orig_k is not None, f"no online match for EMA key {k}"
        out[orig_k] = out[k]
        del out[k]
    return out


def merge_lora_weights(state_dict: Dict[str, np.ndarray], scale: float = 1.0) -> Dict[str, np.ndarray]:
    """Fold LoRA adapters into base weights (``W += up @ down * scale``).

    Counterpart of bin_to_st.py:10-31. Works on a torch-layout state_dict;
    adapter keys are removed after merging.
    """
    out = dict(state_dict)
    for key in list(out.keys()):
        if key.endswith("_adapter_down.weight"):
            base = key[: -len("_adapter_down.weight")]
            up_key = base + "_adapter_up.weight"
            # q_adapter -> to_q ; out_adapter -> to_out.0
            mod, _, proj = base.rpartition(".")
            target = f"{mod}.to_out.0.weight" if proj == "out" else f"{mod}.to_{proj}.weight"
            if up_key in out and target in out:
                out[target] = out[target] + (out[up_key] @ out[key]) * scale
                del out[key], out[up_key]
    return out
