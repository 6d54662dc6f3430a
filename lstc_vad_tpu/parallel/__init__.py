from .mesh import (  # noqa: F401
    batch_sharding,
    factor_devices,
    make_mesh,
    param_sharding_rules,
    shard_params,
)
