"""Checkpoint converter — counterpart of the reference's ``bin_to_st.py``.

Converts between the torch safetensors layout (vista/svd_xt) and the
framework's native Orbax params, optionally merging LoRA adapters into the
base weights (``W += up @ down``).

Usage:
    # torch safetensors -> orbax params dir
    python -m vista_tpu.cli.convert --input ckpts/vista.safetensors --output ckpts/vista_orbax

    # orbax params dir -> torch-layout safetensors (interchange)
    python -m vista_tpu.cli.convert --input ckpts/vista_orbax --output ckpts/vista_export.safetensors

    # merge LoRA inside a torch-layout safetensors
    python -m vista_tpu.cli.convert --input in.safetensors --output out.safetensors --merge-lora

    # DeepSpeed-merged torch pickle -> released-checkpoint layout (the full
    # reference bin_to_st pipeline: LoRA merge + prefix strip + EMA swap)
    python -m vista_tpu.cli.convert --input pytorch_model.bin --output vista.safetensors
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="vista_tpu checkpoint converter")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--merge-lora", action="store_true")
    p.add_argument("--lora-scale", type=float, default=1.0)
    p.add_argument("--action-control", action="store_true",
                   help="config has action-control adapters")
    p.add_argument("--lax", action="store_true", help="non-strict key matching")
    args = p.parse_args(argv)

    import dataclasses

    from vista_tpu.engine import EngineConfig
    from vista_tpu.utils import checkpoint as io

    cfg = EngineConfig()
    if args.action_control:
        cfg = dataclasses.replace(
            cfg,
            unet=dataclasses.replace(cfg.unet, action_control=True),
            conditioner=dataclasses.replace(cfg.conditioner, action_control=True),
        )

    if args.input.endswith((".safetensors", ".bin", ".ckpt", ".pt")):
        if args.input.endswith(".safetensors"):
            sd = io.load_safetensors(args.input)
            if args.merge_lora:
                sd = io.merge_lora_weights(sd, args.lora_scale)
        else:
            # training-checkpoint interchange: the reference bin_to_st
            # pipeline (LoRA merge incl. EMA-mangled names, _forward_module.
            # strip, model_ema -> online swap) runs unconditionally, exactly
            # like /root/reference/bin_to_st.py:10-47
            sd = io.bin_to_state_dict(io.load_torch_bin(args.input))
        if args.output.endswith(".safetensors"):
            io.save_safetensors(args.output, sd)
        else:
            params = io.import_vista_checkpoint(sd, cfg, strict=not args.lax)
            io.save_checkpoint(args.output, params)
    else:
        params = io.load_checkpoint(args.input)
        sd = io.export_vista_checkpoint(params, cfg)
        assert args.output.endswith(".safetensors"), "orbax input needs .safetensors output"
        io.save_safetensors(args.output, sd)
    print(f"converted {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
