"""Measure the PyTorch reference (OpenDriveLab/Vista) — the baseline side.

BASELINE.md requires both sides of the comparison to be *measured* by our
own harness. This script runs on a CUDA machine with the reference's
environment (torch 2.0.1 + xformers + the repo's requirements.txt) and
produces a JSON file that `bench.py --baseline-json` consumes, replacing
the analytic A100 estimate with a measurement.

It cannot run in the TPU build environment (no CUDA, no xformers); it is
committed so the baseline procedure is reproducible and auditable.

Usage (on the A100 box, from the reference repo root):
    python tools/reference_bench.py --reference /path/to/Vista \
        --ckpt ckpts/vista.safetensors --out baseline_measured.json
    # configs measured: the BASELINE.md table (1) 320x576/10 steps,
    # (2) 576x1024/25 steps triangle CFG, (3) +actions, (4) long rollout.

The measured protocol mirrors bench.py exactly: p50 of --iters timed
end-to-end sampling calls (encode excluded, decode included), fresh noise
per iteration, torch.cuda.synchronize() fences.
"""

import argparse
import json
import os
import sys
import time


def build_model(reference: str, ckpt: str, height: int, width: int,
                num_frames: int, num_steps: int, guider: int, cfg_scale: float,
                cfg_min: float):
    sys.path.insert(0, reference)
    from omegaconf import OmegaConf
    from sample_utils import init_model, init_sampling

    version_dict = {
        "model_config": os.path.join(reference, "configs/inference/vista.yaml"),
        "ckpt": ckpt,
        "options": {
            "H": height, "W": width, "T": num_frames, "f": 8,
            "guider": guider, "cfg": [cfg_scale, cfg_min],
            "num_steps": num_steps,
        },
    }
    model = init_model(version_dict)
    sampler = init_sampling(
        guider_types=guider,
        steps=num_steps,
        cfg_scale=cfg_scale,
        cfg_min=cfg_min,
        num_frames=num_frames,
    )
    return model, sampler


def measure_config(reference: str, ckpt: str, *, height: int, width: int,
                   num_frames: int, num_steps: int, n_rounds: int,
                   action: str, iters: int) -> dict:
    import torch
    from sample_utils import do_sample, get_condition

    guider = 2 if n_rounds > 1 else 1  # TrianglePredictionGuider vs VanillaCFG
    model, sampler = build_model(
        reference, ckpt, height, width, num_frames, num_steps, guider,
        cfg_scale=2.5, cfg_min=1.0)

    value_dict = {
        "img_seq": torch.randn(num_frames, 3, height, width).cuda(),
        "motion_bucket_id": 127,
        "fps_id": 9,
        "cond_aug": 0.0,
        "cond_frames_without_noise": None,  # filled by do_sample from images
    }
    if action == "traj":
        value_dict["trajectory"] = torch.zeros(8).cuda()

    images = value_dict["img_seq"]
    times = []
    for i in range(iters):
        torch.manual_seed(i)
        torch.cuda.synchronize()
        t0 = time.perf_counter()
        do_sample(
            images, model, sampler, value_dict,
            num_rounds=n_rounds, num_frames=num_frames,
            force_uc_zero_embeddings=["cond_frames", "cond_frames_without_noise"],
            initial_cond_indices=[0],
        )
        torch.cuda.synchronize()
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    frames_out = n_rounds * (num_frames - 3) + 3 if n_rounds > 1 else num_frames
    return {
        "height": height, "width": width, "frames": num_frames,
        "steps": num_steps, "n_rounds": n_rounds, "action": action,
        "p50_seconds": round(p50, 3),
        "fps": round(frames_out / p50, 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True, help="path to the Vista repo")
    p.add_argument("--ckpt", required=True, help="vista.safetensors path")
    p.add_argument("--out", default="baseline_measured.json")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import torch
    device = torch.cuda.get_device_name(0)

    results = []
    # BASELINE.md configs 1-4
    results.append(measure_config(args.reference, args.ckpt, height=320, width=576,
                                  num_frames=25, num_steps=10, n_rounds=1,
                                  action="free", iters=args.iters))
    results.append(measure_config(args.reference, args.ckpt, height=576, width=1024,
                                  num_frames=25, num_steps=25, n_rounds=1,
                                  action="free", iters=args.iters))
    results.append(measure_config(args.reference, args.ckpt, height=576, width=1024,
                                  num_frames=25, num_steps=25, n_rounds=1,
                                  action="traj", iters=args.iters))
    results.append(measure_config(args.reference, args.ckpt, height=320, width=576,
                                  num_frames=25, num_steps=10, n_rounds=15,
                                  action="free", iters=args.iters))

    payload = {"device": device, "framework": "torch-reference", "results": results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
