from vista_tpu.models.unet import VideoUNet, VideoUNetConfig  # noqa: F401
from vista_tpu.models.vae import (  # noqa: F401
    VAEConfig,
    VAEDecoder,
    VAEEncoder,
    VideoVAEDecoder,
)
from vista_tpu.models.conditioner import ConditionerConfig, GeneralConditioner  # noqa: F401
