"""Pallas TPU kernels for the hot ops (SURVEY §5.7, BASELINE "hot
transforms fuse into Pallas kernels")."""

from ccv_tpu.ops.pallas.flash_attention import flash_attention  # noqa: F401
