from vio_msckf_tpu.data.simulator import SimConfig, simulate_sequence

__all__ = ["SimConfig", "simulate_sequence"]
