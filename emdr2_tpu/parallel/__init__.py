from emdr2_tpu.parallel.mesh import (  # noqa: F401
    LOGICAL_RULES,
    build_mesh,
    build_meshes,
    data_sharding,
    index_sharding,
    param_shardings,
    replicated,
)
from emdr2_tpu.parallel.distributed import (  # noqa: F401
    host_local_rows,
    init_distributed,
    is_coordinator,
    make_global_array,
    make_global_batch,
)
