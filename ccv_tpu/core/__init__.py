from ccv_tpu.core.dense_matrix import DenseMatrix, from_numpy, to_numpy
from ccv_tpu.core import cache, io

__all__ = ["DenseMatrix", "from_numpy", "to_numpy", "cache", "io"]
