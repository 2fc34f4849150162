"""ccv-compatible public API surface.

Mirrors the reference's entry points (``ccv_sobel``, ``ccv_blur``, ...) on
DenseMatrix inputs, with the transparent content-hash memoization cache
(every op derives its output signature from op-name + params + input sigs
and early-returns on a hit — the behavioral twin of
``ccv_declare_derived_signature`` + ``ccv_object_return_if_cached``).

Plain jax arrays can be passed too; caching simply won't engage (sig = 0),
matching the reference's behavior for sig-less matrices.
"""

from __future__ import annotations

from ccv_tpu.core.cache import cached_op
from ccv_tpu.core import algebra as _algebra
from ccv_tpu.ops import basic as _basic
from ccv_tpu.ops import classic as _classic
from ccv_tpu.ops import color as _color
from ccv_tpu.ops import resample as _resample
from ccv_tpu.ops import transform as _transform

# re-export flag constants
from ccv_tpu.ops.basic import FLIP_X as CCV_FLIP_X, FLIP_Y as CCV_FLIP_Y
from ccv_tpu.ops.resample import (
    INTER_AREA as CCV_INTER_AREA,
    INTER_CUBIC as CCV_INTER_CUBIC,
    INTER_LINEAR as CCV_INTER_LINEAR,
)
from ccv_tpu.core.algebra import NO_PADDING as CCV_NO_PADDING, PADDING_ZERO as CCV_PADDING_ZERO
from ccv_tpu.core.io import IO_GRAY as CCV_IO_GRAY, IO_RGB_COLOR as CCV_IO_RGB_COLOR
from ccv_tpu.core.io import read as ccv_read, write as ccv_write  # noqa: F401

ccv_sobel = cached_op("ccv_sobel")(_basic.sobel)
ccv_gradient = cached_op("ccv_gradient", n_outputs=2)(_basic.gradient)
ccv_flip = cached_op("ccv_flip")(_basic.flip)
ccv_blur = cached_op("ccv_blur")(_basic.blur)
ccv_erode = cached_op("ccv_erode")(_basic.erode)
ccv_dilate = cached_op("ccv_dilate")(_basic.dilate)
ccv_resample = cached_op("ccv_resample")(_resample.resample)
ccv_sample_down = cached_op("ccv_sample_down")(_resample.sample_down)
ccv_sample_up = cached_op("ccv_sample_up")(_resample.sample_up)
ccv_color_transform = cached_op("ccv_color_transform")(_color.color_transform)
ccv_saturation = cached_op("ccv_saturation")(_color.saturation)
ccv_contrast = cached_op("ccv_contrast")(_color.contrast)
ccv_decimal_slice = cached_op("ccv_decimal_slice")(_transform.decimal_slice)
ccv_perspective_transform = cached_op("ccv_perspective_transform")(_transform.perspective_transform)
ccv_canny = cached_op("ccv_canny")(_classic.canny)
ccv_close_outline = cached_op("ccv_close_outline")(_classic.close_outline)
ccv_sat = cached_op("ccv_sat")(_algebra.sat)


def ccv_otsu(a, range_: int = 256):
    """Returns (threshold, variance) as Python scalars."""
    from ccv_tpu.core.dense_matrix import as_array

    t, v = _classic.otsu(as_array(a), range_)
    return int(t), float(v)


def ccv_enable_default_cache():
    from ccv_tpu.core import cache

    cache.enable()


def ccv_disable_cache():
    from ccv_tpu.core import cache

    cache.disable()
