"""Golden-file fidelity tests for the basic image primitives.

Twin of reference test/unit/basic.tests.c: each op runs on the same sample
image and is gated against the stored golden output. Integer paths are
expected to be bit-exact (atol=0); see conftest for the tolerance gate.
"""

import math

import numpy as np
import pytest

from conftest import read_golden, requires_reference, reference_path, assert_image_close

from ccv_tpu import compat as ccv
from ccv_tpu.core.io import read, IO_GRAY


@pytest.fixture(scope="module")
def chessbox():
    return read(reference_path("samples/chessbox.png"), IO_GRAY)


@pytest.fixture(scope="module")
def nature():
    return read(reference_path("samples/nature.png"), IO_GRAY)


@pytest.mark.tpu
@requires_reference
class TestSobel:
    def test_sobel_x(self, chessbox):
        out = ccv.ccv_sobel(chessbox, dx=0, dy=1)
        assert_image_close(out.numpy(), read_golden("chessbox.sobel.x.bin"), atol=0, msg="sobel.x")

    def test_sobel_y(self, chessbox):
        out = ccv.ccv_sobel(chessbox, dx=1, dy=0)
        assert_image_close(out.numpy(), read_golden("chessbox.sobel.y.bin"), atol=0, msg="sobel.y")

    def test_sobel_u(self, chessbox):
        out = ccv.ccv_sobel(chessbox, dx=1, dy=1)
        assert_image_close(out.numpy(), read_golden("chessbox.sobel.u.bin"), atol=0, msg="sobel.u")

    def test_sobel_v(self, chessbox):
        out = ccv.ccv_sobel(chessbox, dx=-1, dy=1)
        assert_image_close(out.numpy(), read_golden("chessbox.sobel.v.bin"), atol=0, msg="sobel.v")

    def test_sobel_x3(self, chessbox):
        out = ccv.ccv_sobel(chessbox, dx=0, dy=3)
        assert_image_close(out.numpy(), read_golden("chessbox.sobel.x.3.bin"), atol=0, msg="sobel.x3")

    def test_sobel_y3(self, chessbox):
        out = ccv.ccv_sobel(chessbox, dx=3, dy=0)
        assert_image_close(out.numpy(), read_golden("chessbox.sobel.y.3.bin"), atol=0, msg="sobel.y3")

    def test_sobel_x5(self, chessbox):
        out = ccv.ccv_sobel(chessbox, dx=0, dy=5)
        assert_image_close(out.numpy(), read_golden("chessbox.sobel.x.5.bin"), atol=0, msg="sobel.x5")

    def test_sobel_y5(self, chessbox):
        out = ccv.ccv_sobel(chessbox, dx=5, dy=0)
        assert_image_close(out.numpy(), read_golden("chessbox.sobel.y.5.bin"), atol=0, msg="sobel.y5")


@requires_reference
class TestFlip:
    def test_flip_x(self, chessbox):
        img = read(reference_path("samples/chessbox.png"))
        out = ccv.ccv_flip(img, ftype=ccv.CCV_FLIP_X)
        assert_image_close(out.numpy(), read_golden("chessbox.flip_x.bin"), atol=0, msg="flip_x")

    def test_flip_y(self):
        img = read(reference_path("samples/chessbox.png"))
        out = ccv.ccv_flip(img, ftype=ccv.CCV_FLIP_Y)
        assert_image_close(out.numpy(), read_golden("chessbox.flip_y.bin"), atol=0, msg="flip_y")

    def test_flip_xy(self):
        img = read(reference_path("samples/chessbox.png"))
        out = ccv.ccv_flip(img, ftype=ccv.CCV_FLIP_X | ccv.CCV_FLIP_Y)
        assert_image_close(out.numpy(), read_golden("chessbox.flip_xy.bin"), atol=0, msg="flip_xy")


@requires_reference
class TestMorphology:
    @pytest.mark.parametrize("fsz,name", [(3, "erode_3x3"), (5, "erode_5x5")])
    def test_erode(self, fsz, name):
        img = read(reference_path("samples/chessbox.png"))
        out = ccv.ccv_erode(img, fsz=fsz)
        assert_image_close(out.numpy(), read_golden(f"chessbox.{name}.bin"), atol=0, msg=name)

    @pytest.mark.parametrize("fsz,name", [(3, "dilate_3x3"), (5, "dilate_5x5")])
    def test_dilate(self, fsz, name):
        img = read(reference_path("samples/chessbox.png"))
        out = ccv.ccv_dilate(img, fsz=fsz)
        assert_image_close(out.numpy(), read_golden(f"chessbox.{name}.bin"), atol=0, msg=name)


@requires_reference
class TestBlur:
    def test_blur_sqrt10(self, nature):
        img = read(reference_path("samples/nature.png"))  # color, as the reference test
        out = ccv.ccv_blur(img, sigma=math.sqrt(10))
        assert_image_close(out.numpy(), read_golden("nature.blur.bin"), atol=0, msg="blur")


@pytest.mark.tpu
@requires_reference
class TestResample:
    def test_resample_area(self):
        img = read(reference_path("samples/chessbox.png"))
        g = read_golden("chessbox.resample.bin")
        rows, cols = g.shape[0], g.shape[1]
        out = ccv.ccv_resample(img, rows=rows, cols=cols,
                               rows_scale=1.0 / 5.0, cols_scale=1.0 / 5.0,
                               interp=ccv.CCV_INTER_AREA)
        assert_image_close(out.numpy(), g, atol=1, frac=0.99, msg="resample.area")

    def test_sample_down(self):
        img = read(reference_path("samples/chessbox.png"))
        g = read_golden("chessbox.sample_down.bin")
        out = ccv.ccv_sample_down(img, src_x=10, src_y=10)
        assert_image_close(out.numpy(), g, atol=0, msg="sample_down")

    def test_sample_up(self):
        img = read(reference_path("samples/chessbox.png"))
        g = read_golden("chessbox.sample_up.bin")
        out = ccv.ccv_sample_up(img, src_x=10, src_y=10)
        assert_image_close(out.numpy(), g, atol=0, msg="sample_up")


@requires_reference
class TestClassic:
    def test_canny_blackbox(self):
        img = read(reference_path("samples/blackbox.png"), IO_GRAY)
        out = ccv.ccv_canny(img, size=3, low_thresh=36, high_thresh=36 * 3)
        assert_image_close(out.numpy(), read_golden("blackbox.canny.bin"), atol=0, msg="canny")

    def test_otsu(self):
        # twin of test/unit/basic.tests.c "ccv_otsu" case
        x = np.zeros(36, dtype=np.int32)
        x[[0, 1, 6, 22, 23, 28, 29, 35]] = 0
        x[[2, 7, 12, 16, 21, 27, 34]] = 1
        x[[15, 26]] = 2
        x[[8, 10, 13, 17, 20, 33]] = 3
        x[[3, 4, 9, 11, 14, 18, 19, 25, 32]] = 4
        x[[5, 24, 30, 31]] = 5
        x = x.reshape(6, 6)
        t, var = ccv.ccv_otsu(x, range_=6)
        assert t == 2
        assert abs(var - 2.6287) < 1e-4


@requires_reference
class TestImageProcessing:
    @pytest.mark.parametrize("ds,name", [(0.5, "nature.saturation.0.5.bin"),
                                         (1.5, "nature.saturation.1.5.bin")])
    def test_saturation(self, ds, name):
        img = read(reference_path("samples/nature.png"))
        out = ccv.ccv_saturation(img, ds=ds)
        assert_image_close(out.numpy(), read_golden(name), atol=1, frac=0.999, msg=name)

    @pytest.mark.parametrize("ds,name", [(0.5, "nature.contrast.0.5.bin"),
                                         (1.5, "nature.contrast.1.5.bin")])
    def test_contrast(self, ds, name):
        img = read(reference_path("samples/nature.png"))
        out = ccv.ccv_contrast(img, ds=ds)
        assert_image_close(out.numpy(), read_golden(name), atol=1, frac=0.999, msg=name)


@requires_reference
class TestTransform:
    def test_decimal_slice(self):
        img = read(reference_path("samples/chessbox.png"))
        g = read_golden("chessbox.decimal.slice.bin")
        out = ccv.ccv_decimal_slice(img, y=33.5, x=41.5, rows=g.shape[0], cols=g.shape[1])
        assert_image_close(out.numpy(), g, atol=1, frac=0.999, msg="decimal_slice")

    def test_perspective_transform(self):
        img = read(reference_path("samples/chessbox.png"))
        g = read_golden("chessbox.perspective.transform.bin")
        out = ccv.ccv_perspective_transform(
            img,
            m00=math.cos(math.pi / 6), m01=0, m02=0,
            m10=0, m11=1, m12=0,
            m20=-math.sin(math.pi / 6), m21=0, m22=math.cos(math.pi / 6))
        assert_image_close(out.numpy(), g, atol=2, frac=0.99, msg="perspective")
