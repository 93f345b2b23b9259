"""Video quality metrics: Fréchet feature distance, PSNR, SSIM.

BASELINE.md's quality target is FVD parity with the released
``vista.safetensors``. True FVD uses Kinetics-I3D features (no I3D
checkpoint ships offline); ``frechet_distance`` here is feature-agnostic —
``tools/quality_bench.py`` feeds it per-frame CLIP ViT-H embeddings (the
conditioner tower the engine already carries) as the offline proxy (FCD),
and I3D clip features plug into the same function when available.
Reference quality protocol: arXiv:2405.17398 (paper), not in-repo.

Pure numpy — no torch/scipy dependency (scipy is absent in this build).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(n, d) features -> (mean (d,), covariance (d, d))."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigendecomposition."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """Fréchet distance^2 between Gaussians:
    |mu1-mu2|^2 + tr(S1 + S2 - 2 (S1^{1/2} S2 S1^{1/2})^{1/2}).

    The trace term uses the symmetric form (same spectrum as sqrtm(S1 S2),
    but keeps every intermediate PSD-symmetric so plain eigh suffices).
    """
    diff = np.asarray(mu1, np.float64) - np.asarray(mu2, np.float64)
    s1 = np.asarray(sigma1, np.float64)
    s2 = np.asarray(sigma2, np.float64)
    root1 = _sqrtm_psd(s1)
    cross = _sqrtm_psd(root1 @ s2 @ root1)
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * np.trace(cross))


def frechet_feature_distance(real_feats: np.ndarray,
                             gen_feats: np.ndarray) -> float:
    """Fréchet distance between two feature sets (rows = samples)."""
    mu_r, sig_r = feature_stats(real_feats)
    mu_g, sig_g = feature_stats(gen_feats)
    return frechet_distance(mu_r, sig_r, mu_g, sig_g)


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """Peak signal-to-noise ratio in dB (default range for [-1, 1] video)."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def _filter2d(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' convolution over the two leading spatial axes of
    (h, w, c) — vectorized via sliding windows (no scipy in this build)."""
    win = np.lib.stride_tricks.sliding_window_view
    out = np.einsum("hwcj,j->hwc", win(img, len(k), axis=0), k)
    return np.einsum("hwcj,j->hwc", win(out, len(k), axis=1), k)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """Mean SSIM over (h, w, c) frames (Wang et al. constants, 11x11
    gaussian window). For (t, h, w, c) inputs, averages over frames."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 4:
        return float(np.mean([ssim(x, y, data_range) for x, y in zip(a, b)]))
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = _gaussian_kernel()
    mu_a = _filter2d(a, k)
    mu_b = _filter2d(b, k)
    var_a = _filter2d(a * a, k) - mu_a ** 2
    var_b = _filter2d(b * b, k) - mu_b ** 2
    cov = _filter2d(a * b, k) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    return float(np.mean(num / den))


def corrupt_clip(clip: np.ndarray, kind: str, strength: float,
                 rng: np.random.RandomState) -> np.ndarray:
    """Graded degradations for metric-sensitivity calibration.

    A useful video-quality statistic must move MONOTONICALLY with known
    corruption strength (tools/quality_bench.py --calibrate pins this for
    the Fréchet-CLIP proxy; tests/test_quality_calibration.py runs it on
    the tiny tower). clip: (t, h, w, c) in [-1, 1]; strength in [0, 1].

    - "noise":   additive Gaussian, sigma = strength
    - "blur":    box blur, kernel width grows with strength
    - "shuffle": temporal order destroyed for a strength-fraction of frames
    """
    if kind == "noise":
        out = clip + strength * rng.randn(*clip.shape).astype(clip.dtype)
        return np.clip(out, -1.0, 1.0)
    if kind == "blur":
        k = 1 + 2 * int(round(strength * 4))  # 1, 3, 5, 7, 9
        if k == 1:
            return clip.copy()
        pad = k // 2
        padded = np.pad(clip, ((0, 0), (pad, pad), (pad, pad), (0, 0)), "edge")
        csum = np.cumsum(np.cumsum(padded, axis=1), axis=2)
        csum = np.pad(csum, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h, w = clip.shape[1], clip.shape[2]
        out = (csum[:, k:k + h, k:k + w] - csum[:, :h, k:k + w]
               - csum[:, k:k + h, :w] + csum[:, :h, :w]) / (k * k)
        return out.astype(clip.dtype)
    if kind == "shuffle":
        t = clip.shape[0]
        n = max(2, int(round(strength * t))) if strength > 0 else 0
        out = clip.copy()
        if n:
            idx = np.sort(rng.choice(t, size=n, replace=False))
            # cyclic shift of the chosen frames: every selected position is
            # guaranteed displaced (rng.permutation could draw the identity)
            out[idx] = out[np.roll(idx, 1)]
        return out
    raise ValueError(kind)
