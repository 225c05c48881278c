"""Native C++ unpacker: builds, matches the NumPy reference, and is fast."""

import numpy as np
import pytest

from softgnss_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def numpy_unpack(raw, fmt):
    """The io.py pure-NumPy formulations (reference for the native path)."""
    if fmt == "int4":
        lo = (raw & 0x0F).astype(np.int8)
        hi = (raw >> 4).astype(np.int8)
        lo = np.where(lo >= 8, lo - 16, lo).astype(np.int8)
        hi = np.where(hi >= 8, hi - 16, hi).astype(np.int8)
        return np.stack([lo, hi], axis=1).reshape(-1)
    if fmt == "int2":
        table = np.asarray([1, 3, -1, -3], np.int8)
        pairs = np.stack([(raw >> (2 * i)) & 0x3 for i in range(4)], axis=1)
        return table[pairs].reshape(-1)
    if fmt == "int1":
        bits = np.unpackbits(raw[:, None], axis=1, bitorder="little")
        return (1 - 2 * bits.astype(np.int8)).reshape(-1)
    raise ValueError(fmt)


@pytest.mark.parametrize("fmt", ["int4", "int2", "int1"])
def test_unpack_matches_numpy(lib, fmt, rng):
    raw = rng.integers(0, 256, size=4096).astype(np.uint8)
    out = native.unpack(raw, fmt)
    np.testing.assert_array_equal(out, numpy_unpack(raw, fmt))


def test_uint8_and_int16(lib, rng):
    raw = rng.integers(0, 256, size=1000).astype(np.uint8)
    np.testing.assert_array_equal(native.unpack(raw, "uint8"),
                                  (raw.astype(np.int16) - 128).astype(np.int8))
    raw16 = rng.integers(-32768, 32768, size=1000).astype(np.int16)
    np.testing.assert_array_equal(native.narrow_int16(raw16),
                                  (raw16 >> 8).astype(np.int8))


def test_probe_stats(lib, rng):
    x = rng.integers(-30, 31, size=100000).astype(np.int8)
    stats = native.probe_stats(x)
    assert stats["mean"] == pytest.approx(float(x.mean()), abs=1e-9)
    assert stats["std"] == pytest.approx(float(x.std()), rel=1e-9)
    values, counts = np.unique(x, return_counts=True)
    nz = stats["hist"].nonzero()[0]
    np.testing.assert_array_equal(nz - 128, values)
    np.testing.assert_array_equal(stats["hist"][nz], counts)


def test_io_uses_native_consistently(lib, tmp_path, rng):
    """read_if_samples output is identical whether or not native is used."""
    import softgnss_tpu as sg
    from softgnss_tpu import io as sio

    raw = rng.integers(0, 256, size=3000).astype(np.uint8)
    path = str(tmp_path / "p.bin")
    raw.tofile(path)
    for fmt in ("int4", "int2", "int1"):
        cfg = sg.fast_config(data_format=fmt)
        out = sio.read_if_samples(path, cfg)
        np.testing.assert_array_equal(out, numpy_unpack(raw, fmt))
