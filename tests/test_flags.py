"""Runtime flag system (ccv_nnc_enable_flag twin)."""


def test_flag_bitset():
    from ccv_tpu.utils import flags

    base = flags.flags()
    flags.enable_flag(flags.DISABLE_PALLAS_FLASH_ATTENTION)
    assert flags.is_set(flags.DISABLE_PALLAS_FLASH_ATTENTION)
    flags.disable_flag(flags.DISABLE_PALLAS_FLASH_ATTENTION)
    assert not flags.is_set(flags.DISABLE_PALLAS_FLASH_ATTENTION)
    assert flags.flags() == base & ~flags.DISABLE_PALLAS_FLASH_ATTENTION


def test_native_runtime_flag_gates_load():
    from ccv_tpu.core import native
    from ccv_tpu.utils import flags

    flags.enable_flag(flags.DISABLE_NATIVE_RUNTIME)
    try:
        assert native.load() is None
    finally:
        flags.disable_flag(flags.DISABLE_NATIVE_RUNTIME)
    assert native.load() is not None
