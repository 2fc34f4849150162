"""ASan/UBSan pass over the native C++ runtime — the twin of the
reference's sanitizer CI scheme (lib/scheme.mk:27-46, ubsan-unit-tests
workflow): build native/ with -fsanitize=address,undefined and replay
the cache / MSER / MSCR / image-decode surfaces in a subprocess with the
sanitizer runtime preloaded. Any heap error aborts the child."""

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "ccv_tpu", "native")
ASAN_SO = os.path.join(NATIVE, "libccv_tpu_native_asan.so")


def _libasan() -> str:
    out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                         capture_output=True, text=True).stdout.strip()
    return out if os.path.sep in out else ""


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_under_asan(tmp_path):
    if not os.path.exists(ASAN_SO):
        r = subprocess.run(["make", "-C", NATIVE, "asan"],
                           capture_output=True, timeout=300)
        if r.returncode != 0 or not os.path.exists(ASAN_SO):
            pytest.skip(f"asan build unavailable: {r.stderr[-200:]}")
    libasan = _libasan()
    if not libasan:
        pytest.skip("libasan runtime not found")

    driver = textwrap.dedent("""
        import os, sys
        import numpy as np
        sys.path.insert(0, %r)
        from ccv_tpu.core import native
        lib = native.load()
        assert lib is not None, "asan .so failed to load"
        # siphash + LRU cache: fill past budget to force evictions
        c = native.NativeLru(budget=1 << 14)
        rng = np.random.default_rng(0)
        for i in range(300):
            key = native.siphash24(b"key%%d" %% i)
            c.put(key, bytes(rng.integers(0, 256, 200, dtype=np.uint8)))
            if i %% 3 == 0:
                c.get(native.siphash24(b"key%%d" %% (i // 2)))
            if i %% 7 == 0:
                c.delete(native.siphash24(b"key%%d" %% (i // 3)))
        c.drain()
        # MSER + MSCR component trees on a textured patch. jax must stay
        # out of this child (jaxlib's MLIR bindings throw C++ exceptions
        # that the preloaded ASan interceptor cannot relay), so the
        # MSCR chi edge maps are computed in numpy here.
        from ccv_tpu.detectors import mser
        img = rng.uniform(0, 255, (60, 80)).astype(np.uint8)
        img[20:40, 30:50] = 10  # a stable dark region
        p = mser.MserParams(min_area=20, max_area=1200, max_variance=0.6)
        kp, _ = mser.mser(img, None, p)

        def np_chi_maps(a, sigma):
            x = np.asarray(a, np.float32)
            if x.ndim == 2:
                x = x[..., None]
            def chi(pp, qq, diag):
                v = ((qq - pp) ** 2 / (pp + qq + 1e-10)).sum(-1)
                return np.sqrt(v * 0.5 if diag else v)
            return [np.ascontiguousarray(m, np.float32) for m in
                    (chi(x[:, :-1], x[:, 1:], False),
                     chi(x[:-1, :], x[1:, :], False),
                     chi(x[:-1, :-1], x[1:, 1:], True),
                     chi(x[:-1, 1:], x[1:, :-1], True))]
        mser._chi_maps = np_chi_maps
        rgb = np.stack([img] * 3, axis=-1).astype(np.float32) / 255.0
        mser.mscr(rgb, p)
        # native PNG decode
        from PIL import Image
        path = os.path.join(%r, "a.png")
        Image.fromarray(img).save(path)
        out = native.decode_image(path)
        assert out is not None and out[0].shape[:2] == (60, 80)
        print("ASAN-OK")
    """ % (os.path.abspath(os.path.join(NATIVE, "..", "..")),
           str(tmp_path)))
    env = dict(os.environ)
    env.update({
        "CCV_TPU_NATIVE_LIB": os.path.abspath(ASAN_SO),
        "LD_PRELOAD": libasan,
        "JAX_PLATFORMS": "cpu",
        # abort (don't just log) + UBSan print; leak check off: python +
        # jax allocate plenty the child never frees by design
        "ASAN_OPTIONS": "abort_on_error=1:detect_leaks=0",
        "UBSAN_OPTIONS": "print_stacktrace=1:halt_on_error=1",
    })
    r = subprocess.run([sys.executable, "-c", driver], env=env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-2000:])
    assert "ASAN-OK" in r.stdout
