from vio_msckf_tpu.parallel.multichip import (
    make_mesh,
    make_multichip_filter_step,
    make_multichip_engine_step,
    shard_batch,
    tiny_config,
)

__all__ = [
    "make_mesh",
    "make_multichip_filter_step",
    "make_multichip_engine_step",
    "shard_batch",
    "tiny_config",
]
