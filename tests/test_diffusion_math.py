"""Closed-form unit tests for the EDM diffusion math layer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vista_tpu.diffusion import (
    GuiderConfig,
    SamplerConfig,
    cfg_merge,
    edm_scaling,
    edm_sigmas,
    eps_scaling,
    guider_frame_scales,
    legacy_ddpm_sigmas,
    precondition_denoise,
    sample_edm_sigmas,
    sample_euler_edm,
    v_scaling,
    v_scaling_edm_cnoise,
    v_weighting,
)
from vista_tpu.diffusion.loss import (
    LossConfig,
    cond_mask_table,
    diffusion_loss,
    fourier_filter_highpass,
    fourier_highpass_mask,
    sample_cond_mask,
)
from vista_tpu.diffusion.weighting import edm_weighting, eps_weighting, unit_weighting


class TestScalings:
    def test_edm_closed_form(self):
        sigma = jnp.array([0.5])
        c_skip, c_out, c_in, c_noise = edm_scaling(sigma, sigma_data=0.5)
        np.testing.assert_allclose(c_skip, 0.5, rtol=1e-6)
        np.testing.assert_allclose(c_out, 0.25 / np.sqrt(0.5), rtol=1e-6)
        np.testing.assert_allclose(c_in, 1.0 / np.sqrt(0.5), rtol=1e-6)
        np.testing.assert_allclose(c_noise, 0.25 * np.log(0.5), rtol=1e-6)

    def test_v_scaling_closed_form(self):
        sigma = jnp.array([1.0])
        c_skip, c_out, c_in, c_noise = v_scaling(sigma)
        np.testing.assert_allclose(c_skip, 0.5, rtol=1e-6)
        np.testing.assert_allclose(c_out, -1.0 / np.sqrt(2.0), rtol=1e-6)
        np.testing.assert_allclose(c_in, 1.0 / np.sqrt(2.0), rtol=1e-6)
        np.testing.assert_allclose(c_noise, 1.0, rtol=1e-6)

    def test_v_edm_cnoise_is_v_with_log_noise(self):
        sigma = jnp.array([0.3, 2.0, 50.0])
        a = v_scaling(sigma)
        b = v_scaling_edm_cnoise(sigma)
        for i in range(3):
            np.testing.assert_allclose(a[i], b[i], rtol=1e-6)
        np.testing.assert_allclose(b[3], 0.25 * np.log(sigma), rtol=5e-5)

    def test_eps_scaling(self):
        sigma = jnp.array([2.0])
        c_skip, c_out, c_in, c_noise = eps_scaling(sigma)
        assert c_skip[0] == 1.0
        assert c_out[0] == -2.0
        np.testing.assert_allclose(c_in, 1.0 / np.sqrt(5.0), rtol=1e-6)
        assert c_noise[0] == 2.0


class TestDiscretization:
    def test_edm_endpoints_and_zero(self):
        s = np.asarray(edm_sigmas(50, 0.002, 700.0, 7.0))
        assert s.shape == (51,)
        np.testing.assert_allclose(s[0], 700.0, rtol=1e-4)
        np.testing.assert_allclose(s[49], 0.002, rtol=1e-4)
        assert s[50] == 0.0
        assert np.all(np.diff(s) < 0)

    def test_edm_rho_formula(self):
        s = np.asarray(edm_sigmas(3, 0.1, 10.0, 7.0, append_zero=False))
        ramp = np.linspace(0, 1, 3)
        expected = (10.0 ** (1 / 7) + ramp * (0.1 ** (1 / 7) - 10.0 ** (1 / 7))) ** 7
        np.testing.assert_allclose(s, expected, rtol=1e-5)

    def test_legacy_ddpm_descending_with_zero(self):
        s = np.asarray(legacy_ddpm_sigmas(50))
        assert s.shape == (51,)
        assert np.all(np.diff(s[:-1]) < 0)
        assert s[-1] == 0.0
        # full-table variant matches the beta-schedule closed form at the ends
        s_full = np.asarray(legacy_ddpm_sigmas(1000, append_zero=False))
        betas = np.linspace(0.00085**0.5, 0.0120**0.5, 1000) ** 2
        ac = np.cumprod(1 - betas)
        np.testing.assert_allclose(s_full[0], ((1 - ac[-1]) / ac[-1]) ** 0.5, rtol=1e-5)


class TestWeighting:
    def test_values(self):
        sigma = jnp.array([0.5, 1.0, 2.0])
        np.testing.assert_allclose(unit_weighting(sigma), 1.0)
        np.testing.assert_allclose(
            edm_weighting(sigma, 0.5), (sigma**2 + 0.25) / (sigma * 0.5) ** 2, rtol=1e-6
        )
        np.testing.assert_allclose(v_weighting(sigma), (sigma**2 + 1) / sigma**2, rtol=1e-6)
        np.testing.assert_allclose(eps_weighting(sigma), sigma**-2.0, rtol=1e-6)


class TestSigmaSampling:
    def test_per_video_repeat(self):
        s = sample_edm_sigmas(jax.random.key(0), n_videos=4, num_frames=25, p_mean=1.0, p_std=1.6)
        assert s.shape == (100,)
        s = np.asarray(s).reshape(4, 25)
        for row in s:
            assert np.all(row == row[0])
        assert len(np.unique(s[:, 0])) == 4

    def test_lognormal_stats(self):
        s = sample_edm_sigmas(jax.random.key(1), n_videos=20000, num_frames=1, p_mean=1.0, p_std=1.6)
        logs = np.log(np.asarray(s))
        assert abs(logs.mean() - 1.0) < 0.05
        assert abs(logs.std() - 1.6) < 0.05

    def test_defaults_match_shipped_loss_config(self):
        """Function defaults must equal the shipped Vista values so direct
        callers get training-identical sigmas (vista_phase1.yaml:181-186)."""
        import inspect

        from vista_tpu.diffusion.loss import LossConfig

        sig = inspect.signature(sample_edm_sigmas)
        assert sig.parameters["p_mean"].default == LossConfig.sigma_p_mean == 1.0
        assert sig.parameters["p_std"].default == LossConfig.sigma_p_std == 1.6


class TestGuidance:
    def test_vanilla_scales_constant(self):
        s = guider_frame_scales(GuiderConfig(kind="vanilla", scale=2.5, num_frames=25))
        np.testing.assert_allclose(s, 2.5)

    def test_linear_scales(self):
        s = guider_frame_scales(GuiderConfig(kind="linear", scale=3.0, min_scale=1.5, num_frames=25))
        np.testing.assert_allclose(s, np.linspace(1.5, 3.0, 25), rtol=1e-6)

    def test_triangle_scales_period1_max(self):
        # period=1: triangle wave is 0 at the ends and peaks (=1) mid-sequence
        s = guider_frame_scales(
            GuiderConfig(kind="triangle", scale=2.5, min_scale=1.0, num_frames=25, period=1.0)
        )
        values = np.linspace(0, 1, 25)
        wave = 2 * np.abs(values - np.floor(values + 0.5))
        np.testing.assert_allclose(s, wave * 1.5 + 1.0, rtol=1e-6)
        assert s[0] == pytest.approx(1.0)
        assert s[12] == pytest.approx(2.5)

    def test_identity_none(self):
        assert guider_frame_scales(GuiderConfig(kind="identity")) is None

    def test_cfg_merge(self):
        t = 5
        x_u = jnp.ones((t, 2, 2, 1))
        x_c = 3.0 * jnp.ones((t, 2, 2, 1))
        scales = jnp.arange(1.0, 6.0)
        merged = cfg_merge(jnp.concatenate([x_u, x_c]), scales, num_frames=t)
        expected = 1.0 + scales * 2.0
        np.testing.assert_allclose(np.asarray(merged)[:, 0, 0, 0], expected, rtol=1e-6)


class TestDenoiser:
    def test_preconditioning_identity_network(self):
        # network = identity => output should be x*c_in*c_out + x*c_skip
        x = jnp.ones((2, 4, 4, 3)) * 2.0
        sigma = jnp.array([1.0, 1.0])

        def net(xin, c_noise, cond, cond_mask):
            np.testing.assert_allclose(np.asarray(c_noise), 0.0, atol=1e-6)  # 0.25*log(1)=0
            return xin

        out = precondition_denoise(net, x, sigma, {}, None)
        c_skip, c_out, c_in, _ = v_scaling_edm_cnoise(jnp.array(1.0))
        np.testing.assert_allclose(np.asarray(out), 2.0 * (c_in * c_out + c_skip), rtol=1e-5)


class TestSampler:
    def test_perfect_denoiser_recovers_target(self):
        """If the denoiser always returns the clean target, one Euler chain converges to it."""
        target = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 4), dtype=jnp.float32)

        def denoise_fn(x, sigma, cond, cond_mask):
            return target

        noise = jnp.asarray(np.random.RandomState(1).randn(4, 8, 8, 4), dtype=jnp.float32)
        cfg = SamplerConfig(num_steps=30, guider=GuiderConfig(kind="identity"), sigma_max=80.0)
        out = sample_euler_edm(denoise_fn, noise, cond={}, config=cfg, num_frames=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)

    def test_cond_frame_pinning_exact(self):
        target = jnp.zeros((4, 8, 8, 4))
        cond_frame = jnp.asarray(np.random.RandomState(2).randn(4, 8, 8, 4), dtype=jnp.float32)
        cond_mask = jnp.array([1.0, 0.0, 0.0, 0.0])

        def denoise_fn(x, sigma, cond, cond_mask):
            return target

        noise = jnp.asarray(np.random.RandomState(3).randn(4, 8, 8, 4), dtype=jnp.float32)
        cfg = SamplerConfig(num_steps=10, guider=GuiderConfig(kind="identity"))
        out = sample_euler_edm(
            denoise_fn, noise, cond={}, cond_frame=cond_frame, cond_mask=cond_mask,
            config=cfg, num_frames=4,
        )
        # frame 0 must be pinned exactly to the conditional frame
        np.testing.assert_allclose(np.asarray(out)[0], np.asarray(cond_frame)[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out)[1:], 0.0, atol=1e-3)

    def test_cfg_doubling_path(self):
        """With uc != cond, vanilla CFG extrapolates: out = u + s(c - u)."""
        t = 2

        def denoise_fn(x, sigma, cond, cond_mask):
            # conditioning supplies per-half targets: first half uc -> 0, second half c -> 1
            half = x.shape[0] // 2
            return jnp.concatenate(
                [jnp.zeros_like(x[:half]), jnp.ones_like(x[:half])], axis=0
            ) * cond["v"][:, None, None, None]

        cond = {"v": jnp.ones((t,))}
        uc = {"v": jnp.ones((t,))}
        noise = jnp.asarray(np.random.RandomState(4).randn(t, 4, 4, 2), dtype=jnp.float32)
        cfg = SamplerConfig(num_steps=20, guider=GuiderConfig(kind="vanilla", scale=2.0, num_frames=t))
        out = sample_euler_edm(denoise_fn, noise, cond=cond, uc=uc, config=cfg, num_frames=t)
        # CFG target = 0 + 2*(1 - 0) = 2
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=5e-3)

    def test_sequential_cfg_matches_batched(self):
        """cfg_mode='sequential' must be numerically identical to 'batched'."""
        t = 4

        def denoise_fn(x, sigma, cond, cond_mask):
            # respond to the conditioning value so the halves differ
            return cond["v"][:, None, None, None] * jnp.ones_like(x)

        cond = {"v": jnp.full((t,), 1.0)}
        uc = {"v": jnp.zeros((t,))}
        noise = jnp.asarray(np.random.RandomState(7).randn(t, 4, 4, 2), jnp.float32)
        base = dict(num_steps=8, guider=GuiderConfig(kind="linear", scale=3.0,
                                                     min_scale=1.0, num_frames=t))
        out_b = sample_euler_edm(denoise_fn, noise, cond, uc,
                                 config=SamplerConfig(**base, cfg_mode="batched"),
                                 num_frames=t)
        out_s = sample_euler_edm(denoise_fn, noise, cond, uc,
                                 config=SamplerConfig(**base, cfg_mode="sequential"),
                                 num_frames=t)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s), atol=1e-5)

    def test_init_noise_rescale(self):
        """x0 is noise * sqrt(1 + sigma_0^2); a fixed-point denoiser preserves it."""

        def denoise_fn(x, sigma, cond, cond_mask):
            return x  # d = (x - x)/sigma = 0 -> state never moves

        noise = jnp.ones((2, 4, 4, 1))
        cfg = SamplerConfig(num_steps=3, sigma_max=80.0, guider=GuiderConfig(kind="identity"))
        out = sample_euler_edm(denoise_fn, noise, cond={}, config=cfg, num_frames=2)
        np.testing.assert_allclose(np.asarray(out), np.sqrt(1.0 + 80.0**2), rtol=1e-5)


class TestLoss:
    def _denoise_fn(self, noised, sigmas, cond, cond_mask):
        return jnp.zeros_like(noised)

    def test_cond_mask_table(self):
        table = cond_mask_table([(), (0,), (0, 1)], 4)
        np.testing.assert_array_equal(table, [[0, 0, 0, 0], [1, 0, 0, 0], [1, 1, 0, 0]])

    def test_sample_cond_mask_distribution(self):
        cfg = LossConfig(num_frames=4, replace_cond_frames=True,
                         cond_frames_choices=((), (0,), (0, 1), (0, 1, 2)))
        masks = sample_cond_mask(jax.random.key(0), cfg, 4000).reshape(4000, 4)
        n_pinned = np.asarray(masks.sum(axis=1))
        # weights 1,2,4,8 -> P(3 pinned frames) = 8/15
        assert abs((n_pinned == 3).mean() - 8 / 15) < 0.05
        assert abs((n_pinned == 0).mean() - 1 / 15) < 0.03

    def test_highpass_mask_geometry(self):
        m = fourier_highpass_mask(16, 16)
        assert m[8, 8] == 0.0  # DC (after fftshift) is masked
        assert m[0, 0] == 1.0  # corners (highest freq) pass

    def test_fourier_filter_removes_dc(self):
        x = jnp.ones((2, 16, 16, 4)) * 5.0  # pure DC
        mask = jnp.asarray(fourier_highpass_mask(16, 16))
        out = fourier_filter_highpass(x, mask)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_fourier_filter_3d_removes_dc(self):
        from vista_tpu.diffusion.loss import (
            fourier_filter_highpass_3d,
            fourier_highpass_mask_3d,
        )

        m = fourier_highpass_mask_3d(4, 16, 16)
        assert m[2, 8, 8] == 0.0  # spatiotemporal DC masked
        assert m[0, 0, 0] == 1.0  # highest freqs pass
        x = jnp.ones((8, 16, 16, 4)) * 3.0  # (b*t) frame-major, pure DC
        out = fourier_filter_highpass_3d(x, jnp.asarray(m), num_frames=4)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_zero_error_gives_zero_loss(self):
        latents = jnp.asarray(np.random.RandomState(0).randn(8, 8, 8, 4), dtype=jnp.float32)

        def perfect(noised, sigmas, cond, cond_mask):
            return latents

        cfg = LossConfig(num_frames=4)
        loss, aux = diffusion_loss(perfect, latents, {}, jax.random.key(0), cfg)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-8)

    def test_loss_finite_with_additional_terms(self):
        latents = jnp.asarray(np.random.RandomState(0).randn(8, 8, 8, 4), dtype=jnp.float32)
        cfg = LossConfig(num_frames=4, use_additional_loss=True, replace_cond_frames=True,
                         offset_noise_level=0.02,
                         cond_frames_choices=((), (0,), (0, 1)))
        loss, aux = diffusion_loss(self._denoise_fn, latents, {}, jax.random.key(1), cfg)
        assert np.isfinite(float(loss))
        assert float(loss) > 0
        assert np.isfinite(float(aux["loss_hf"]))

    def test_cond_frames_excluded_from_loss(self):
        """With all frames pinned, the prediction is replaced by GT -> zero loss."""
        latents = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 4), dtype=jnp.float32)
        # a single choice pinning frames 0-2: only frame 3 contributes
        cfg = LossConfig(num_frames=4, replace_cond_frames=True,
                         cond_frames_choices=((0, 1, 2),))
        def bad(noised, sigmas, cond, cond_mask):
            return jnp.zeros_like(noised)

        loss, _ = diffusion_loss(bad, latents, {}, jax.random.key(2), cfg)
        cfg_none = LossConfig(num_frames=4, replace_cond_frames=False)
        loss_none, _ = diffusion_loss(bad, latents, {}, jax.random.key(2), cfg_none)
        assert float(loss) < float(loss_none)


class TestDiscreteDenoiser:
    """Golden parity with the reference DiscreteDenoiser (denoiser.py:38-69)."""

    def _table(self):
        return legacy_ddpm_sigmas(50, append_zero=False)

    def test_sigma_quantized_and_idx_conditioning(self):
        from vista_tpu.diffusion import precondition_denoise_discrete, sigma_to_idx

        table = self._table()
        sigma = jnp.asarray([0.05, 1.0, 7.7, float(table[0])])
        idx = sigma_to_idx(sigma, table)
        # nearest-entry quantization
        for s, i in zip(np.asarray(sigma), np.asarray(idx)):
            assert i == int(np.argmin(np.abs(np.asarray(table) - s)))

        captured = {}

        def net(xin, c_noise, cond, mask):
            captured["c_noise"] = c_noise
            captured["xin"] = xin
            return jnp.zeros_like(xin)

        x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 4), jnp.float32)
        out = precondition_denoise_discrete(
            net, x, sigma, {}, table, scaling=eps_scaling, quantize_c_noise=True)
        # EpsScaling: c_noise == sigma, so quantized c_noise == table index
        np.testing.assert_array_equal(np.asarray(captured["c_noise"]),
                                      np.asarray(idx, np.float32))
        # c_in/c_skip/c_out computed from the QUANTIZED sigma
        sq = np.asarray(table)[np.asarray(idx)]
        c_in = 1.0 / np.sqrt(sq**2 + 1.0)
        np.testing.assert_allclose(
            np.asarray(captured["xin"]),
            np.asarray(x) * c_in[:, None, None, None], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)

    def test_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        from tests.torch_ref import load_reference
        from vista_tpu.diffusion import precondition_denoise_discrete

        load_reference()
        from vwm.modules.diffusionmodules.denoiser import DiscreteDenoiser

        tden = DiscreteDenoiser(
            scaling_config={
                "target": "vwm.modules.diffusionmodules.denoiser_scaling.EpsScaling"},
            num_idx=50,
            discretization_config={
                "target":
                    "vwm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"},
        )

        class Net(torch.nn.Module):
            def forward(self, x, c_noise, cond, cond_mask, num_frames):
                return x * 0.5 + c_noise.view(-1, 1, 1, 1) * 0.01

        rng = np.random.RandomState(1)
        x = rng.randn(4, 4, 8, 8).astype(np.float32)
        sigma = np.asarray([0.05, 1.0, 7.7, 80.0], np.float32)
        with torch.no_grad():
            ref = tden(Net(), torch.from_numpy(x), torch.from_numpy(sigma),
                       {}, None).numpy()

        def net(xin, c_noise, cond, mask):
            return xin * 0.5 + c_noise.reshape(-1, 1, 1, 1) * 0.01

        table = jnp.asarray(tden.sigmas.numpy())
        out = precondition_denoise_discrete(
            net, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(sigma), {},
            table, scaling=eps_scaling, quantize_c_noise=True)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                                   atol=1e-5, rtol=1e-5)
