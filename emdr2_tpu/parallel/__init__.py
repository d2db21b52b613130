from emdr2_tpu.parallel.mesh import (  # noqa: F401
    LOGICAL_RULES,
    build_mesh,
    data_sharding,
    index_sharding,
    param_shardings,
    replicated,
)
