"""Quality metrics: closed-form checks for the Fréchet/PSNR/SSIM math
(tools/quality_bench.py harness; reference quality protocol lives in the
paper arXiv:2405.17398, not the repo)."""

import numpy as np

from vista_tpu.utils.metrics import (
    feature_stats,
    frechet_distance,
    frechet_feature_distance,
    psnr,
    ssim,
)


class TestFrechet:
    def test_identical_gaussians_zero(self):
        rng = np.random.RandomState(0)
        mu = rng.randn(6)
        a = rng.randn(6, 6)
        sigma = a @ a.T
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8

    def test_diagonal_closed_form(self):
        # commuting (diagonal) covariances: FD^2 = |dmu|^2 + sum (sqrt(s1)-sqrt(s2))^2
        mu1 = np.array([0.0, 1.0, -2.0])
        mu2 = np.array([1.0, 1.0, 0.0])
        s1 = np.diag([1.0, 4.0, 9.0])
        s2 = np.diag([4.0, 1.0, 1.0])
        expected = np.sum((mu1 - mu2) ** 2) + np.sum(
            (np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2)
        got = frechet_distance(mu1, s1, mu2, s2)
        np.testing.assert_allclose(got, expected, rtol=1e-10)

    def test_same_distribution_samples_small(self):
        rng = np.random.RandomState(1)
        a = rng.randn(4000, 4)
        b = rng.randn(4000, 4)
        far = rng.randn(4000, 4) + 3.0
        near = frechet_feature_distance(a, b)
        assert near < 0.05
        assert frechet_feature_distance(a, far) > 10 * near

    def test_feature_stats_shapes(self):
        mu, sig = feature_stats(np.random.RandomState(2).randn(10, 5))
        assert mu.shape == (5,) and sig.shape == (5, 5)


class TestFrameMetrics:
    def test_psnr_exact(self):
        x = np.zeros((8, 8, 3))
        assert psnr(x, x) == float("inf")
        # constant offset 0.2 on [-1,1] range: 10*log10(4 / 0.04)
        np.testing.assert_allclose(psnr(x, x + 0.2), 10 * np.log10(4 / 0.04),
                                   rtol=1e-10)

    def test_ssim_bounds(self):
        rng = np.random.RandomState(3)
        x = rng.rand(32, 32, 3) * 2 - 1
        assert abs(ssim(x, x) - 1.0) < 1e-9
        noisy = np.clip(x + rng.randn(32, 32, 3) * 0.5, -1, 1)
        s = ssim(x, noisy)
        assert 0.0 < s < 0.9

    def test_ssim_video_averages(self):
        rng = np.random.RandomState(4)
        v = rng.rand(3, 32, 32, 3)
        assert abs(ssim(v, v) - 1.0) < 1e-9
