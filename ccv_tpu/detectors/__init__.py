from ccv_tpu.detectors import scd

__all__ = ["scd"]
