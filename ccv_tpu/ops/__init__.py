from ccv_tpu.ops import basic, resample, color, transform, classic, pyramid

__all__ = ["basic", "resample", "color", "transform", "classic", "pyramid"]
