"""Diffusion training loss with Vista's dynamics-enhancement terms.

Behavioral counterpart of ``vwm/modules/diffusionmodules/loss.py``:

- lognormal sigma sampling, one sigma per video;
- per-video random conditional-frame mask drawn from ``cond_frames_choices``
  with weights ``2^n`` (loss.py:71-79); condition frames get ``sigma = 0``
  (loss.py:87-90) and their prediction is replaced by ground truth before the
  loss (loss.py:96-99);
- optional offset noise (whole channel shifted together, loss.py:81-86);
- dynamics enhancement (``use_additional_loss``): a weight map
  ``1 + normalize(inter-frame-difference error)`` multiplying the per-pixel
  loss, plus a high-frequency Fourier-filtered loss term (loss.py:102-124).

TPU-first notes: the Fourier high-pass mask is precomputed once at trace time
with numpy (the reference rebuilds it per call with Python loops,
vwm/modules/diffusionmodules/util.py:20-43); the cond-mask choice becomes a
static lookup table indexed by a categorical draw; everything lives in one
jit-able pure function of (params, batch, rng).

Layout: latents are NHWC ``(b*t, h, w, c)``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vista_tpu.diffusion.weighting import get_weighting
from vista_tpu.utils.basic import append_dims

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LossConfig:
    loss_type: str = "l2"  # "l2" | "l1"
    weighting: str = "v"
    sigma_p_mean: float = 1.0
    sigma_p_std: float = 1.6
    num_frames: int = 25
    use_additional_loss: bool = False
    additional_loss_weight: float = 0.1
    offset_noise_level: float = 0.0
    replace_cond_frames: bool = False
    # Shipped training choice set (configs/training/vista_phase1.yaml:175-179).
    cond_frames_choices: Tuple[Tuple[int, ...], ...] = ((), (0,), (0, 1), (0, 1, 2))


def cond_mask_table(choices: Sequence[Sequence[int]], num_frames: int) -> np.ndarray:
    """Static ``(n_choices, num_frames)`` 0/1 table of frame-pinning patterns."""
    table = np.zeros((len(choices), num_frames), dtype=np.float32)
    for i, idxs in enumerate(choices):
        for j in idxs:
            table[i, j] = 1.0
    return table


def sample_cond_mask(
    key: jax.Array, cfg: LossConfig, n_videos: int
) -> Array:
    """Draw a per-video cond-frame mask; returns ``(n_videos*num_frames,)``."""
    table = jnp.asarray(cond_mask_table(cfg.cond_frames_choices, cfg.num_frames))
    weights = np.array([2.0**n for n in range(len(cfg.cond_frames_choices))])
    logits = jnp.log(jnp.asarray(weights / weights.sum()))
    idx = jax.random.categorical(key, logits, shape=(n_videos,))
    return table[idx].reshape(-1)


def fourier_highpass_mask(h: int, w: int, d_s: float = 0.25) -> np.ndarray:
    """Static FFT-shifted mask that zeroes low frequencies (``scale=0`` filter).

    Matches the reference's mask geometry (util.py:28-34): entry (i, j) is 0
    when ``(2i/H - 1)^2 + (2j/W - 1)^2 <= 2*d_s``, else 1 — computed once with
    vectorized numpy instead of a per-call Python double loop.
    """
    ii = (2.0 * np.arange(h) / h - 1.0) ** 2
    jj = (2.0 * np.arange(w) / w - 1.0) ** 2
    d_square = ii[:, None] + jj[None, :]
    return (d_square > 2.0 * d_s).astype(np.float32)


def fourier_filter_highpass(x: Array, mask: Array) -> Array:
    """High-pass filter frames via 2-D FFT over the spatial axes (NHWC input)."""
    x32 = x.astype(jnp.complex64)
    x_freq = jnp.fft.fftn(x32, axes=(1, 2))
    x_freq = jnp.fft.fftshift(x_freq, axes=(1, 2))
    x_freq = x_freq * mask[None, :, :, None]
    x_freq = jnp.fft.ifftshift(x_freq, axes=(1, 2))
    return jnp.fft.ifftn(x_freq, axes=(1, 2)).real.astype(x.dtype)


def fourier_highpass_mask_3d(t: int, h: int, w: int, d_s: float = 0.25,
                             d_t: float = 0.25) -> np.ndarray:
    """Spatiotemporal counterpart of :func:`fourier_highpass_mask`
    (reference util.py:46-74 fourier_filter_3d, scale=0 case): entry
    (k, i, j) is 0 when ``(d_s/d_t (2k/T-1))^2 + (2i/H-1)^2 + (2j/W-1)^2
    <= 2*d_s``."""
    tt = ((d_s / d_t) * (2.0 * np.arange(t) / t - 1.0)) ** 2
    ii = (2.0 * np.arange(h) / h - 1.0) ** 2
    jj = (2.0 * np.arange(w) / w - 1.0) ** 2
    d_square = tt[:, None, None] + ii[None, :, None] + jj[None, None, :]
    return (d_square > 2.0 * d_s).astype(np.float32)


def fourier_filter_highpass_3d(x: Array, mask: Array, num_frames: int) -> Array:
    """3-D (t, h, w) high-pass over frame-major video ``((b t), h, w, c)``
    — the reference's fourier_filter_3d with scale=0 (unused in shipped
    configs, like its torch counterpart; kept for inventory parity)."""
    bt, h, w, c = x.shape
    x5 = x.reshape(bt // num_frames, num_frames, h, w, c).astype(jnp.complex64)
    x_freq = jnp.fft.fftn(x5, axes=(1, 2, 3))
    x_freq = jnp.fft.fftshift(x_freq, axes=(1, 2, 3))
    x_freq = x_freq * mask[None, :, :, :, None]
    x_freq = jnp.fft.ifftshift(x_freq, axes=(1, 2, 3))
    out = jnp.fft.ifftn(x_freq, axes=(1, 2, 3)).real
    return out.reshape(bt, h, w, c).astype(x.dtype)


def _dynamics_weight(predict: Array, target: Array, num_frames: int, ord_: int) -> Array:
    """``1 + normalize(inter-frame difference error)`` weight map, shape of target."""
    bt, h, w, c = target.shape
    b = bt // num_frames
    p = predict.reshape(b, num_frames, h, w, c)
    t = target.reshape(b, num_frames, h, w, c)
    diff_err = (t[:, 1:] - t[:, :-1]) - (p[:, 1:] - p[:, :-1])
    aux = diff_err**2 if ord_ == 2 else jnp.abs(diff_err)
    # L_p-normalize over the flattened (t h w) axis per (video, channel), as
    # the reference's F.normalize over the "(t h w)" dim (loss.py:108-110).
    flat = aux.reshape(b, (num_frames - 1) * h * w, c)
    if ord_ == 2:
        norm = jnp.sqrt(jnp.sum(flat**2, axis=1, keepdims=True))
    else:
        norm = jnp.sum(jnp.abs(flat), axis=1, keepdims=True)
    flat = flat / jnp.maximum(norm, 1e-12)
    aux_w = flat.reshape(b, num_frames - 1, h, w, c)
    aux_w = jnp.concatenate([jnp.zeros((b, 1, h, w, c), aux_w.dtype), aux_w], axis=1)
    return jax.lax.stop_gradient(1.0 + aux_w.reshape(bt, h, w, c))


def diffusion_loss(
    denoise_fn: Callable[[Array, Array, dict, Optional[Array]], Array],
    latents: Array,
    cond: dict,
    key: jax.Array,
    cfg: LossConfig = LossConfig(),
) -> Tuple[Array, dict]:
    """Compute the (scalar) training loss on clean latents ``(b*t, h, w, c)``.

    denoise_fn: preconditioned model call (network + EDM scaling folded in).
    Returns (loss, aux_metrics).
    """
    bt = latents.shape[0]
    n_videos = bt // cfg.num_frames
    k_sigma, k_mask, k_noise, k_offset = jax.random.split(key, 4)

    log_sigma = cfg.sigma_p_mean + cfg.sigma_p_std * jax.random.normal(k_sigma, (n_videos,))
    sigmas = jnp.repeat(jnp.exp(log_sigma), cfg.num_frames)

    if cfg.replace_cond_frames:
        cond_mask = sample_cond_mask(k_mask, cfg, n_videos)
    else:
        cond_mask = jnp.zeros((bt,), dtype=jnp.float32)

    noise = jax.random.normal(k_noise, latents.shape, dtype=latents.dtype)
    if cfg.offset_noise_level > 0.0:
        offset = jax.random.normal(k_offset, (bt, latents.shape[-1]), dtype=latents.dtype)
        noise = noise + cfg.offset_noise_level * offset[:, None, None, :]

    sigmas_bc = append_dims((1.0 - cond_mask) * sigmas, latents.ndim)
    noised = latents + noise * sigmas_bc

    model_output = denoise_fn(noised, sigmas, cond, cond_mask)

    w = append_dims(get_weighting(cfg.weighting)(sigmas), latents.ndim)
    mask_b = append_dims(cond_mask, latents.ndim)
    predict = model_output * (1.0 - mask_b) + latents * mask_b

    err = predict - latents
    per_pix = w * (err**2 if cfg.loss_type == "l2" else jnp.abs(err))

    if cfg.use_additional_loss:
        ord_ = 2 if cfg.loss_type == "l2" else 1
        aux_w = _dynamics_weight(predict, latents, cfg.num_frames, ord_)
        hp_mask = jnp.asarray(fourier_highpass_mask(latents.shape[1], latents.shape[2]))
        predict_hf = fourier_filter_highpass(predict, hp_mask)
        target_hf = fourier_filter_highpass(latents, hp_mask)
        hf_err = predict_hf - target_hf
        hf_per_pix = w * (hf_err**2 if cfg.loss_type == "l2" else jnp.abs(hf_err))
        hf_loss = jnp.mean(hf_per_pix.reshape(bt, -1), axis=1).mean()
        main = jnp.mean((per_pix * aux_w).reshape(bt, -1), axis=1).mean()
        loss = main + cfg.additional_loss_weight * hf_loss
        return loss, {"loss_main": main, "loss_hf": hf_loss, "sigma_mean": sigmas.mean()}

    loss = jnp.mean(per_pix.reshape(bt, -1), axis=1).mean()
    return loss, {"loss_main": loss, "sigma_mean": sigmas.mean()}
