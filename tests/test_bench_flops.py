"""Guards bench.py's analytic FLOPs/MFU model (round-5 measurement layer).

``bench._analytic_flops`` lowers an all-XLA twin of one denoiser eval on
the CPU backend and counts HLO flops — the basis of the emitted
``flops_per_frame``/``mfu`` fields. The end-of-round benchmark run relies
on it, so pin here (tiny config, no compile, no device memory) that:

- it returns a positive finite count with the kernel gates restored after,
- CFG batching doubles the denoiser term (triangle guider vs vanilla at
  scale 1.0),
- skipping decode strictly reduces the total.
"""

import argparse

import jax
import jax.numpy as jnp

import bench
from vista_tpu.engine.engine import EngineConfig, VistaEngine
from vista_tpu.models.unet import VideoUNet
from vista_tpu.models.vae import VideoVAEDecoder


def _setup():
    ecfg = EngineConfig().tiny()
    ucfg = ecfg.unet
    vcfg = ecfg.vae
    engine = VistaEngine(ecfg)
    t = ecfg.num_frames
    hl = wl = 32 // vcfg.downsample_factor
    ctx_dim = ucfg.context_dim
    unet = VideoUNet(ucfg)
    decoder = VideoVAEDecoder(vcfg)
    x = jnp.zeros((t, hl, wl, ucfg.in_channels), jnp.bfloat16)
    sigma = jnp.full((t,), 1.0)
    context = jnp.zeros((1, 1, ctx_dim), jnp.bfloat16)
    y = jnp.zeros((1, ucfg.adm_in_channels), jnp.bfloat16)
    mask = jnp.zeros((t,)).at[0].set(1.0)
    unet_params = jax.eval_shape(
        lambda k: unet.init(k, x, sigma, context, y, mask, t), jax.random.key(0))
    dec_params = jax.eval_shape(
        lambda k: decoder.init(k, jnp.zeros((1, hl, wl, vcfg.z_channels)), 1),
        jax.random.key(0))
    return ucfg, engine, unet_params, dec_params, t, hl, wl, ctx_dim


def _args(**kw):
    base = dict(steps=5, frames=None, guider="triangle", cfg_scale=2.5,
                no_decode=False)
    base.update(kw)
    return argparse.Namespace(**base)


def test_analytic_flops_positive_and_gates_restored():
    import vista_tpu.ops.temporal_conv as _tc
    import vista_tpu.ops.norms as _norms

    gates = (_tc._PALLAS, _tc._FUSED_GN, _norms.layer_norm)
    ucfg, engine, up, dp, t, hl, wl, cd = _setup()
    total = bench._analytic_flops(_args(), ucfg, engine, up, dp, t, hl, wl, cd)
    assert total > 0 and jnp.isfinite(total)
    # monkeypatched kernel gates must be restored
    assert (_tc._PALLAS, _tc._FUSED_GN, _norms.layer_norm) == gates


def test_analytic_flops_cfg_and_decode_terms():
    ucfg, engine, up, dp, t, hl, wl, cd = _setup()
    cfg2 = bench._analytic_flops(_args(), ucfg, engine, up, dp, t, hl, wl, cd)
    cfg1 = bench._analytic_flops(_args(guider="vanilla", cfg_scale=1.0),
                                 ucfg, engine, up, dp, t, hl, wl, cd)
    nodec = bench._analytic_flops(_args(no_decode=True),
                                  ucfg, engine, up, dp, t, hl, wl, cd)
    # CFG doubles only the denoiser term: cfg2 = 2*denoise + decode,
    # cfg1 = denoise + decode, nodec = 2*denoise
    denoise = cfg2 - cfg1
    assert denoise > 0
    assert abs(nodec - 2 * denoise) / nodec < 1e-6
    decode = cfg1 - denoise
    assert decode > 0
