from vista_tpu.diffusion.scaling import (  # noqa: F401
    DenoiserScaling,
    edm_scaling,
    eps_scaling,
    get_scaling,
    v_scaling,
    v_scaling_edm_cnoise,
)
from vista_tpu.diffusion.discretization import (  # noqa: F401
    edm_sigmas,
    legacy_ddpm_sigmas,
)
from vista_tpu.diffusion.sigma_sampling import sample_edm_sigmas, sample_discrete_sigmas  # noqa: F401
from vista_tpu.diffusion.weighting import (  # noqa: F401
    edm_weighting,
    eps_weighting,
    unit_weighting,
    v_weighting,
)
from vista_tpu.diffusion.guidance import GuiderConfig, guider_frame_scales, cfg_merge  # noqa: F401
from vista_tpu.diffusion.denoiser import (  # noqa: F401
    precondition_denoise,
    precondition_denoise_discrete,
    sigma_to_idx,
)
from vista_tpu.diffusion.sampler import SamplerConfig, sample_euler_edm  # noqa: F401
from vista_tpu.diffusion.loss import LossConfig, diffusion_loss  # noqa: F401
