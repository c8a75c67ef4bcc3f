from ivideogpt_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    shard_batch,
)
from ivideogpt_tpu.parallel.distributed import (  # noqa: F401
    maybe_initialize,
    make_global_mesh,
    global_batch,
    gather_across_processes,
    params_to_host,
    is_main_process,
    agreed_timestamp,
)
