from vista_tpu.engine.engine import EngineConfig, VistaEngine  # noqa: F401
from vista_tpu.engine.rollout import RolloutConfig, autoregressive_rollout  # noqa: F401
from vista_tpu.engine.reward import estimate_reward  # noqa: F401
