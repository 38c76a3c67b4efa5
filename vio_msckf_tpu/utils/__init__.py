from vio_msckf_tpu.utils.metrics import ate_rmse, rpe_rmse, umeyama_alignment

__all__ = ["ate_rmse", "rpe_rmse", "umeyama_alignment"]
