from vio_msckf_tpu.parallel.multichip import (
    make_mesh,
    make_multichip_filter_step,
    make_multichip_engine_step,
    shard_batch,
    tiny_config,
)
from vio_msckf_tpu.parallel.distributed import (
    initialize_from_env,
    make_global_mesh,
    make_global_batch,
    local_rows,
    collect_local_outputs,
)

__all__ = [
    "make_mesh",
    "make_multichip_filter_step",
    "make_multichip_engine_step",
    "shard_batch",
    "tiny_config",
    "initialize_from_env",
    "make_global_mesh",
    "make_global_batch",
    "local_rows",
    "collect_local_outputs",
]
