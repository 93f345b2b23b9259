from vista_tpu.parallel.kernel_sharding import (  # noqa: F401
    kernel_sharding,
    shard_kernel,
)
from vista_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    fsdp_param_specs,
    make_mesh,
    replicated,
    shard_pytree,
)
