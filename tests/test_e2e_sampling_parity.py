"""End-to-end sampling parity: our scan sampler vs the reference torch stack.

Runs the reference's Denoiser + EulerEDMSampler + guiders on a tiny torch
VideoUNet, and our precondition/sample_euler_edm on the weight-mapped Flax
twin, with identical noise/conditioning — the latents must match. This pins
the whole L3+L2 inference stack (preconditioning, sigma schedule, init-noise
rescale, per-step cond-frame pinning, CFG merge) in one test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.test_golden_parity import T, HL, WL, tiny_flax_unet_cfg, tiny_torch_unet, to_flax_unet_params
from tests.torch_ref import load_reference
from vista_tpu.diffusion import (
    GuiderConfig,
    SamplerConfig,
    precondition_denoise,
    sample_euler_edm,
)
from vista_tpu.models.unet import VideoUNet

REF = load_reference()


def _torch_stack(num_steps, scale, num_frames, guider="VanillaCFG"):
    import sys

    sys.path.insert(0, "/root/reference")
    from vwm.modules.diffusionmodules.denoiser import Denoiser
    from vwm.modules.diffusionmodules.sampling import EulerEDMSampler

    denoiser = Denoiser(
        {"target": "vwm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"},
        num_frames=num_frames,
    )
    guider_params = {"scale": scale} if guider == "VanillaCFG" else {
        "max_scale": scale, "min_scale": 1.0, "num_frames": num_frames}
    sampler = EulerEDMSampler(
        num_steps=num_steps,
        discretization_config={
            "target": "vwm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_min": 0.002, "sigma_max": 700.0, "rho": 7.0},
        },
        guider_config={
            "target": f"vwm.modules.diffusionmodules.guiders.{guider}",
            "params": guider_params,
        },
        verbose=False,
        device="cpu",
    )
    return denoiser, sampler


@pytest.mark.parametrize("guider_pair", [
    ("VanillaCFG", "vanilla"),
    ("TrianglePredictionGuider", "triangle"),
])
def test_sampling_latents_match_reference(guider_pair):
    t_guider, j_guider = guider_pair
    num_steps = 4
    scale = 2.0
    cfg = tiny_flax_unet_cfg()
    tmodel = tiny_torch_unet(cfg)
    with torch.no_grad():
        for n, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)
    params = {"params": to_flax_unet_params(tmodel, cfg)}
    fmodel = VideoUNet(cfg)

    rng = np.random.RandomState(0)
    noise = rng.randn(T, 4, HL, WL).astype(np.float32)
    cond_frame = rng.randn(T, 4, HL, WL).astype(np.float32)
    concat = rng.randn(T, 4, HL, WL).astype(np.float32)
    context_c = rng.randn(1, 1, cfg.context_dim).astype(np.float32)
    y = rng.randn(1, cfg.adm_in_channels).astype(np.float32)
    cond_mask = np.array([1.0, 0, 0, 0], np.float32)

    # ---- torch reference: real Denoiser + EulerEDMSampler + guider stack ----
    denoiser_t, sampler_t = _torch_stack(num_steps, scale, T, t_guider)

    def wrapper_net(inp, c_noise, cond, mask, nf):
        # OpenAIWrapper counterpart (wrappers.py:24-40)
        xc = torch.cat([inp, cond["concat"]], dim=1)
        return tmodel(xc, c_noise, context=cond["crossattn"], y=cond["vector"],
                      cond_mask=mask, num_frames=nf)

    c_t = {"concat": torch.from_numpy(np.repeat(concat[:1], T, 0)),
           "crossattn": torch.from_numpy(context_c),
           "vector": torch.from_numpy(y)}
    uc_t = {"concat": torch.zeros_like(c_t["concat"]),
            "crossattn": torch.zeros_like(c_t["crossattn"]),
            "vector": c_t["vector"]}

    with torch.no_grad():
        ref_out = sampler_t(
            lambda x, s, c, m: denoiser_t(wrapper_net, x, s, c, m),
            torch.from_numpy(noise.copy()),
            cond=c_t,
            uc=uc_t,
            cond_frame=torch.from_numpy(cond_frame),
            cond_mask=torch.from_numpy(cond_mask),
        ).numpy()

    # ---- ours ----
    def network_fn(xin, c_noise, cond, mask):
        xcat = jnp.concatenate([xin, cond["concat"]], axis=-1)
        return fmodel.apply(params, xcat, c_noise, cond["crossattn"], cond["vector"],
                            mask, T)

    def denoise_fn(x, sigma, cond, mask):
        return precondition_denoise(network_fn, x, sigma, cond, mask)

    to_nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    c_j = {"concat": to_nhwc(np.repeat(concat[:1], T, 0)),
           "crossattn": jnp.asarray(context_c), "vector": jnp.asarray(y)}
    uc_j = {"concat": jnp.zeros_like(c_j["concat"]),
            "crossattn": jnp.zeros_like(c_j["crossattn"]), "vector": c_j["vector"]}
    scfg = SamplerConfig(num_steps=num_steps,
                         guider=GuiderConfig(kind=j_guider, scale=scale, num_frames=T))
    out = sample_euler_edm(
        denoise_fn, to_nhwc(noise), c_j, uc_j,
        cond_frame=to_nhwc(cond_frame), cond_mask=jnp.asarray(cond_mask),
        config=scfg, num_frames=T,
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref_out, atol=5e-3, rtol=5e-3)
