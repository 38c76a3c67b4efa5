from vio_msckf_tpu.runtime import native_loader

__all__ = ["native_loader"]
