"""Torch-checkpoint interop: map the reference state_dict onto flax pytrees.

The released ``vista.safetensors`` / ``svd_xt.safetensors`` checkpoints
(~1.5B-param UNet + VAE + CLIP) use the reference's PyTorch module tree
(SURVEY.md §7 "checkpoint parity" hard part). This module builds an explicit
key map — torch dotted name -> (flax path, transform) — by walking the same
construction order as our Flax modules, then materializes the flax params.

Transforms:
- linear: torch ``(out, in)`` -> flax Dense kernel ``(in, out)`` (transpose)
- conv2d: torch OIHW -> flax HWIO
- conv3d: torch OITHW (torch: (out, in, t, h, w)) -> flax (t, h, w, in, out)
- direct: copied as-is (norm scales/biases, mix_factor, embeddings)

Top-level checkpoint prefixes (vista.safetensors):
- ``model.diffusion_model.``            -> params["unet"]
- ``first_stage_model.encoder.``        -> params["encoder"]
- ``first_stage_model.decoder.``        -> params["decoder"] (VideoDecoder)
- ``conditioner.embedders.0.open_clip.model.visual.`` -> conditioner/clip_tower
- ``conditioner.embedders.3.encoder.encoder.``        -> conditioner/cond_frames_encoder
- ``conditioner.embedders.3.encoder.quant_conv.``     -> conditioner/quant_conv
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from vista_tpu.models.unet import VideoUNetConfig
from vista_tpu.models.vae import VAEConfig
from vista_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig

# one entry: (torch_key, flax_path ("/"-joined), transform)
Entry = Tuple[str, str, str]


def _transform(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return np.ascontiguousarray(value.T)
    if kind == "conv2d":
        return np.ascontiguousarray(value.transpose(2, 3, 1, 0))
    if kind == "conv3d":
        return np.ascontiguousarray(value.transpose(2, 3, 4, 1, 0))
    if kind == "direct":
        return np.ascontiguousarray(value)
    raise ValueError(kind)


def _inv_transform(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return np.ascontiguousarray(value.T)
    if kind == "conv2d":
        return np.ascontiguousarray(value.transpose(3, 2, 0, 1))
    if kind == "conv3d":
        return np.ascontiguousarray(value.transpose(4, 3, 0, 1, 2))
    if kind == "direct":
        return np.ascontiguousarray(value)
    raise ValueError(kind)


# ---------------- building blocks ----------------

def _linear(t: str, f: str, bias: bool = True) -> List[Entry]:
    out = [(f"{t}.weight", f"{f}/kernel", "linear")]
    if bias:
        out.append((f"{t}.bias", f"{f}/bias", "direct"))
    return out


def _conv2d(t: str, f: str, bias: bool = True) -> List[Entry]:
    out = [(f"{t}.weight", f"{f}/kernel", "conv2d")]
    if bias:
        out.append((f"{t}.bias", f"{f}/bias", "direct"))
    return out


def _conv3d(t: str, f: str) -> List[Entry]:
    return [(f"{t}.weight", f"{f}/kernel", "conv3d"),
            (f"{t}.bias", f"{f}/bias", "direct")]


def _norm(t: str, f: str) -> List[Entry]:
    """GroupNorm/LayerNorm: torch weight/bias -> flax scale/bias under the
    wrapper submodule (GroupNorm32 -> <f>/norm, LayerNorm -> <f>/ln)."""
    return [(f"{t}.weight", f"{f}/scale", "direct"),
            (f"{t}.bias", f"{f}/bias", "direct")]


def _mlp(t: str, f: str) -> List[Entry]:
    """torch Sequential(linear, SiLU, linear) -> TimestepMLP fc1/fc2."""
    return _linear(f"{t}.0", f"{f}/fc1") + _linear(f"{t}.2", f"{f}/fc2")


def _attention(t: str, f: str, lora: bool, action: bool) -> List[Entry]:
    e: List[Entry] = []
    e += _linear(f"{t}.to_q", f"{f}/to_q", bias=False)
    e += _linear(f"{t}.to_k", f"{f}/to_k", bias=False)
    e += _linear(f"{t}.to_v", f"{f}/to_v", bias=False)
    e += _linear(f"{t}.to_out.0", f"{f}/to_out")
    if lora:
        for p in ("q", "k", "v"):
            e += _linear(f"{t}.{p}_adapter_down", f"{f}/{p}_adapter/down", bias=False)
            e += _linear(f"{t}.{p}_adapter_up", f"{f}/{p}_adapter/up", bias=False)
        e += _linear(f"{t}.out_adapter_down", f"{f}/out_adapter/down", bias=False)
        e += _linear(f"{t}.out_adapter_up", f"{f}/out_adapter/up", bias=False)
    if action:
        e += _linear(f"{t}.k_adapter_action_control", f"{f}/k_adapter_action", bias=False)
        e += _linear(f"{t}.v_adapter_action_control", f"{f}/v_adapter_action", bias=False)
    return e


def _geglu_ff(t: str, f: str) -> List[Entry]:
    return _linear(f"{t}.net.0.proj", f"{f}/proj_in") + _linear(f"{t}.net.2", f"{f}/proj_out")


def _spatial_block(t: str, f: str, lora: bool, action: bool) -> List[Entry]:
    """BasicTransformerBlock -> TransformerBlock."""
    e: List[Entry] = []
    e += _norm(f"{t}.norm1", f"{f}/norm1/ln")
    e += _attention(f"{t}.attn1", f"{f}/attn1", lora, False)
    e += _norm(f"{t}.norm2", f"{f}/norm2/ln")
    e += _attention(f"{t}.attn2", f"{f}/attn2", lora, action)
    e += _norm(f"{t}.norm3", f"{f}/norm3/ln")
    e += _geglu_ff(f"{t}.ff", f"{f}/ff")
    return e


def _temporal_block(t: str, f: str, lora: bool, action: bool) -> List[Entry]:
    """VideoTransformerBlock (ff_in=True) -> TemporalTransformerBlock.

    The flax body lives under a ``core`` submodule (scan-able over row
    chunks, models/attention.py _TemporalCore)."""
    f = f"{f}/core"
    e: List[Entry] = []
    e += _norm(f"{t}.norm_in", f"{f}/norm_in/ln")
    e += _geglu_ff(f"{t}.ff_in", f"{f}/ff_in")
    e += _norm(f"{t}.norm1", f"{f}/norm1/ln")
    e += _attention(f"{t}.attn1", f"{f}/attn1", lora, False)
    e += _norm(f"{t}.norm2", f"{f}/norm2/ln")
    e += _attention(f"{t}.attn2", f"{f}/attn2", lora, action)
    e += _norm(f"{t}.norm3", f"{f}/norm3/ln")
    e += _geglu_ff(f"{t}.ff", f"{f}/ff")
    return e


def _svt(t: str, f: str, depth: int, lora: bool, action: bool) -> List[Entry]:
    """SpatialVideoTransformer (use_linear_in_transformer=True)."""
    e: List[Entry] = []
    e += _norm(f"{t}.norm", f"{f}/norm/norm")
    e += _linear(f"{t}.proj_in", f"{f}/proj_in")
    for d in range(depth):
        e += _spatial_block(f"{t}.transformer_blocks.{d}", f"{f}/block_{d}", lora, action)
        e += _temporal_block(f"{t}.time_stack.{d}", f"{f}/time_block_{d}", lora, action)
    e += _linear(f"{t}.time_pos_embed.0", f"{f}/time_pos_embed_fc1")
    e += _linear(f"{t}.time_pos_embed.2", f"{f}/time_pos_embed_fc2")
    e.append((f"{t}.time_mixer.mix_factor", f"{f}/time_mixer/mix_factor", "direct"))
    e += _linear(f"{t}.proj_out", f"{f}/proj_out")
    return e


def _unet_res(t: str, f: str, in_ch: int, out_ch: int) -> List[Entry]:
    """UNet VideoResBlock (spatial ResBlock + temporal time_stack + mixer)."""
    e: List[Entry] = []
    e += _norm(f"{t}.in_layers.0", f"{f}/spatial/in_norm/norm")
    e += _conv2d(f"{t}.in_layers.2", f"{f}/spatial/in_conv")
    e += _linear(f"{t}.emb_layers.1", f"{f}/spatial/emb_proj")
    e += _norm(f"{t}.out_layers.0", f"{f}/spatial/out_norm/norm")
    e += _conv2d(f"{t}.out_layers.3", f"{f}/spatial/out_conv")
    if in_ch != out_ch:
        e += _conv2d(f"{t}.skip_connection", f"{f}/spatial/skip_conv")
    e += _norm(f"{t}.time_stack.in_layers.0", f"{f}/time_stack/in_norm/norm")
    e += _conv3d(f"{t}.time_stack.in_layers.2", f"{f}/time_stack/in_conv")
    e += _linear(f"{t}.time_stack.emb_layers.1", f"{f}/time_stack/emb_proj")
    e += _norm(f"{t}.time_stack.out_layers.0", f"{f}/time_stack/out_norm/norm")
    e += _conv3d(f"{t}.time_stack.out_layers.3", f"{f}/time_stack/out_conv")
    e.append((f"{t}.time_mixer.mix_factor", f"{f}/time_mixer/mix_factor", "direct"))
    return e


# ---------------- UNet map ----------------

def unet_key_map(cfg: VideoUNetConfig) -> List[Entry]:
    """Full key map for VideoUNet, walking the reference's block-index order
    (video_model.py construction loop)."""
    e: List[Entry] = []
    lora, action = cfg.add_lora, cfg.action_control
    depth = cfg.transformer_depth

    e += _mlp("time_embed", "time_embed")
    e += _mlp("cond_time_stack_embed", "cond_time_stack_embed")
    e += _mlp("label_emb.0", "label_emb")
    e += _conv2d("input_blocks.0.0", "conv_in")

    ch = cfg.model_channels
    ds = 1
    idx = 1
    for level, mult in enumerate(cfg.channel_mult):
        for i in range(cfg.num_res_blocks):
            out_ch = mult * cfg.model_channels
            e += _unet_res(f"input_blocks.{idx}.0", f"down_{level}_{i}_res", ch, out_ch)
            ch = out_ch
            if ds in cfg.attention_resolutions:
                e += _svt(f"input_blocks.{idx}.1", f"down_{level}_{i}_attn", depth, lora, action)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            e += _conv2d(f"input_blocks.{idx}.0.op", f"down_{level}_downsample/conv")
            ds *= 2
            idx += 1

    e += _unet_res("middle_block.0", "mid_res1", ch, ch)
    e += _svt("middle_block.1", "mid_attn", depth, lora, action)
    e += _unet_res("middle_block.2", "mid_res2", ch, ch)

    # decoder: skip-channel bookkeeping mirrors the forward pass
    skip_chs = [cfg.model_channels]
    c = cfg.model_channels
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            c = mult * cfg.model_channels
            skip_chs.append(c)
        if level != len(cfg.channel_mult) - 1:
            skip_chs.append(c)

    idx = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            ich = skip_chs.pop()
            out_ch = mult * cfg.model_channels
            e += _unet_res(f"output_blocks.{idx}.0", f"up_{level}_{i}_res", ch + ich, out_ch)
            ch = out_ch
            layer = 1
            if ds in cfg.attention_resolutions:
                e += _svt(f"output_blocks.{idx}.{layer}", f"up_{level}_{i}_attn", depth, lora, action)
                layer += 1
            if level != 0 and i == cfg.num_res_blocks:
                e += _conv2d(f"output_blocks.{idx}.{layer}.conv", f"up_{level}_upsample/conv")
                ds //= 2
            idx += 1

    e += _norm("out.0", "out_norm/norm")
    e += _conv2d("out.2", "conv_out")
    return e


# ---------------- VAE maps ----------------

def _vae_res(t: str, f: str, in_ch: int, out_ch: int, nested_spatial: bool) -> List[Entry]:
    p = f"{f}/spatial" if nested_spatial else f
    e: List[Entry] = []
    e += _norm(f"{t}.norm1", f"{p}/norm1/norm")
    e += _conv2d(f"{t}.conv1", f"{p}/conv1")
    e += _norm(f"{t}.norm2", f"{p}/norm2/norm")
    e += _conv2d(f"{t}.conv2", f"{p}/conv2")
    if in_ch != out_ch:
        e += _conv2d(f"{t}.nin_shortcut", f"{p}/nin_shortcut")
    return e


def _vae_video_res(t: str, f: str, in_ch: int, out_ch: int) -> List[Entry]:
    """temporal_ae VideoResBlock: spatial params at torch top level, plus a
    time_stack ResBlock (skip_t_emb -> no emb layers) and a mix_factor."""
    e = _vae_res(t, f, in_ch, out_ch, nested_spatial=True)
    e += _norm(f"{t}.time_stack.in_layers.0", f"{f}/ts_in_norm/norm")
    e += _conv3d(f"{t}.time_stack.in_layers.2", f"{f}/ts_in_conv")
    e += _norm(f"{t}.time_stack.out_layers.0", f"{f}/ts_out_norm/norm")
    e += _conv3d(f"{t}.time_stack.out_layers.3", f"{f}/ts_out_conv")
    e.append((f"{t}.mix_factor", f"{f}/mix_factor", "direct"))
    return e


def _vae_attn(t: str, f: str) -> List[Entry]:
    e: List[Entry] = []
    e += _norm(f"{t}.norm", f"{f}/norm/norm")
    for p in ("q", "k", "v", "proj_out"):
        e += _conv2d(f"{t}.{p}", f"{f}/{p}")
    return e


def vae_encoder_key_map(cfg: VAEConfig) -> List[Entry]:
    e: List[Entry] = []
    e += _conv2d("conv_in", "conv_in")
    in_ch = cfg.ch
    for level, mult in enumerate(cfg.ch_mult):
        out_ch = cfg.ch * mult
        for i in range(cfg.num_res_blocks):
            e += _vae_res(f"down.{level}.block.{i}", f"down_{level}_block_{i}",
                          in_ch, out_ch, nested_spatial=False)
            in_ch = out_ch
        if level != len(cfg.ch_mult) - 1:
            e += _conv2d(f"down.{level}.downsample.conv", f"down_{level}_downsample/conv")
    e += _vae_res("mid.block_1", "mid_block_1", in_ch, in_ch, False)
    e += _vae_attn("mid.attn_1", "mid_attn_1")
    e += _vae_res("mid.block_2", "mid_block_2", in_ch, in_ch, False)
    e += _norm("norm_out", "norm_out/norm")
    e += _conv2d("conv_out", "conv_out")
    return e


def vae_decoder_key_map(cfg: VAEConfig, video: bool = True) -> List[Entry]:
    e: List[Entry] = []
    block_in = cfg.ch * cfg.ch_mult[-1]
    e += _conv2d("conv_in", "conv_in")
    res = (lambda t, f, i, o: _vae_video_res(t, f, i, o)) if video else (
        lambda t, f, i, o: _vae_res(t, f, i, o, False))
    e += res("mid.block_1", "mid_block_1", block_in, block_in)
    e += _vae_attn("mid.attn_1", "mid_attn_1")
    e += res("mid.block_2", "mid_block_2", block_in, block_in)
    in_ch = block_in
    for level in reversed(range(len(cfg.ch_mult))):
        out_ch = cfg.ch * cfg.ch_mult[level]
        for i in range(cfg.num_res_blocks + 1):
            e += res(f"up.{level}.block.{i}", f"up_{level}_block_{i}", in_ch, out_ch)
            in_ch = out_ch
        if level != 0:
            e += _conv2d(f"up.{level}.upsample.conv", f"up_{level}_upsample/conv")
    e += _norm("norm_out", "norm_out/norm")
    e += _conv2d("conv_out", "conv_out")
    if video:
        e += _conv3d("conv_out.time_mix_conv", "time_mix_conv")
    return e


# ---------------- CLIP map ----------------

def clip_key_map(cfg: CLIPVisionConfig) -> List[Entry]:
    """open_clip ViT visual tower -> CLIPVisionTower."""
    e: List[Entry] = [
        ("conv1.weight", "patch_embed/kernel", "conv2d"),
        ("class_embedding", "class_embedding", "direct"),
        ("positional_embedding", "positional_embedding", "direct"),
        ("proj", "proj", "direct"),
    ]
    e += _norm("ln_pre", "ln_pre/ln")
    for i in range(cfg.layers):
        t = f"transformer.resblocks.{i}"
        f = f"block_{i}"
        e += _norm(f"{t}.ln_1", f"{f}/ln_1/ln")
        e += [(f"{t}.attn.in_proj_weight", f"{f}/attn/in_proj/kernel", "linear"),
              (f"{t}.attn.in_proj_bias", f"{f}/attn/in_proj/bias", "direct")]
        e += _linear(f"{t}.attn.out_proj", f"{f}/attn/out_proj")
        e += _norm(f"{t}.ln_2", f"{f}/ln_2/ln")
        e += _linear(f"{t}.mlp.c_fc", f"{f}/mlp_fc")
        e += _linear(f"{t}.mlp.c_proj", f"{f}/mlp_proj")
    e += _norm("ln_post", "ln_post/ln")
    return e


def import_hf_clip_text(state_dict: Dict[str, np.ndarray], cfg: CLIPTextConfig) -> Dict:
    """HF ``CLIPTextModel`` (openai/clip-vit-large-patch14 layout) state dict
    -> CLIPTextTower flax params. The separate q/k/v projections are fused
    into the tower's single in_proj before key mapping. Accepts keys with or
    without the ``text_model.`` prefix."""
    sd = {k.removeprefix("text_model."): np.asarray(v) for k, v in state_dict.items()}

    fused = {
        "token_embedding": sd["embeddings.token_embedding.weight"],
        "positional_embedding": sd["embeddings.position_embedding.weight"],
        "ln_final.weight": sd["final_layer_norm.weight"],
        "ln_final.bias": sd["final_layer_norm.bias"],
    }
    for i in range(cfg.layers):
        h = f"encoder.layers.{i}"
        fused[f"blk.{i}.in_proj_weight"] = np.concatenate(
            [sd[f"{h}.self_attn.q_proj.weight"], sd[f"{h}.self_attn.k_proj.weight"],
             sd[f"{h}.self_attn.v_proj.weight"]], axis=0)
        fused[f"blk.{i}.in_proj_bias"] = np.concatenate(
            [sd[f"{h}.self_attn.q_proj.bias"], sd[f"{h}.self_attn.k_proj.bias"],
             sd[f"{h}.self_attn.v_proj.bias"]], axis=0)
        for name in ("out_proj",):
            fused[f"blk.{i}.{name}.weight"] = sd[f"{h}.self_attn.{name}.weight"]
            fused[f"blk.{i}.{name}.bias"] = sd[f"{h}.self_attn.{name}.bias"]
        for t, f in (("layer_norm1", "ln_1"), ("layer_norm2", "ln_2")):
            fused[f"blk.{i}.{f}.weight"] = sd[f"{h}.{t}.weight"]
            fused[f"blk.{i}.{f}.bias"] = sd[f"{h}.{t}.bias"]
        for t, f in (("mlp.fc1", "mlp_fc"), ("mlp.fc2", "mlp_proj")):
            fused[f"blk.{i}.{f}.weight"] = sd[f"{h}.{t}.weight"]
            fused[f"blk.{i}.{f}.bias"] = sd[f"{h}.{t}.bias"]

    entries: List[Entry] = [
        ("token_embedding", "token_embedding/embedding", "direct"),
        ("positional_embedding", "positional_embedding", "direct"),
    ]
    entries += _norm("ln_final", "ln_final/ln")
    for i in range(cfg.layers):
        t, f = f"blk.{i}", f"block_{i}"
        entries += [(f"{t}.in_proj_weight", f"{f}/attn/in_proj/kernel", "linear"),
                    (f"{t}.in_proj_bias", f"{f}/attn/in_proj/bias", "direct")]
        entries += _linear(f"{t}.out_proj", f"{f}/attn/out_proj")
        entries += _norm(f"{t}.ln_1", f"{f}/ln_1/ln")
        entries += _norm(f"{t}.ln_2", f"{f}/ln_2/ln")
        entries += _linear(f"{t}.mlp_fc", f"{f}/mlp_fc")
        entries += _linear(f"{t}.mlp_proj", f"{f}/mlp_proj")
    return apply_key_map(fused, entries, "", strict=True)


# ---------------- application ----------------

def _set_path(tree: Dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def apply_key_map(
    state_dict: Dict[str, np.ndarray],
    entries: List[Entry],
    torch_prefix: str = "",
    strict: bool = True,
) -> Dict:
    """Materialize a flax param subtree from a torch state_dict."""
    out: Dict = {}
    missing = []
    for torch_key, flax_path, kind in entries:
        full = torch_prefix + torch_key
        if full not in state_dict:
            missing.append(full)
            continue
        value = np.asarray(state_dict[full], dtype=np.float32)
        _set_path(out, flax_path, _transform(value, kind))
    if missing and strict:
        raise KeyError(f"missing {len(missing)} torch keys, first: {missing[:5]}")
    return out


def export_key_map(flax_params: Dict, entries: List[Entry], torch_prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse: build a torch-layout state_dict from a flax subtree."""
    out: Dict[str, np.ndarray] = {}
    for torch_key, flax_path, kind in entries:
        node = flax_params
        ok = True
        for k in flax_path.split("/"):
            if k not in node:
                ok = False
                break
            node = node[k]
        if not ok:
            continue
        out[torch_prefix + torch_key] = _inv_transform(np.asarray(node, dtype=np.float32), kind)
    return out
