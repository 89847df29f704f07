"""Native C++ codec tests: byte-for-byte equivalence with the numpy
implementations (which are themselves oracle-tested in test_packing.py)."""

import numpy as np
import pytest
import zlib

from rabitq_tpu import native
from rabitq_tpu.ops import packing

pytestmark = pytest.mark.skipif(
    native.load(build=True) is None, reason="native library unavailable (no g++?)"
)


def test_binary_matches_numpy(rng):
    bits = (rng.random((17, 130)) < 0.5).astype(np.uint8)
    np.testing.assert_array_equal(
        native.pack_binary(bits),
        np.packbits(bits, axis=-1, bitorder="big"),
    )
    packed = native.pack_binary(bits)
    np.testing.assert_array_equal(
        native.unpack_binary(packed, 130),
        np.unpackbits(packed, axis=-1, bitorder="big")[..., :130],
    )


@pytest.mark.parametrize("ex_bits", [1, 3, 5, 7])
def test_ex_generic_matches_numpy(ex_bits, rng):
    ex = rng.integers(0, 1 << ex_bits, size=(9, 96)).astype(np.uint16)
    np.testing.assert_array_equal(
        native.pack_ex_generic(ex, ex_bits), packing.pack_ex_generic(ex, ex_bits)
    )
    packed = native.pack_ex_generic(ex, ex_bits)
    np.testing.assert_array_equal(
        native.unpack_ex_generic(packed, 96, ex_bits),
        packing.unpack_ex_generic(packed, 96, ex_bits),
    )


@pytest.mark.parametrize("ex_bits", [2, 6])
def test_ex_cpp_matches_numpy(ex_bits, rng):
    ex = rng.integers(0, 1 << ex_bits, size=(5, 64)).astype(np.uint16)
    np_fn = packing.pack_ex_2bit_cpp if ex_bits == 2 else packing.pack_ex_6bit_cpp
    np.testing.assert_array_equal(native.pack_ex_cpp(ex, ex_bits), np_fn(ex))
    packed = native.pack_ex_cpp(ex, ex_bits)
    np_un = packing.unpack_ex_2bit_cpp if ex_bits == 2 else packing.unpack_ex_6bit_cpp
    np.testing.assert_array_equal(
        native.unpack_ex_cpp(packed, 64, ex_bits), np_un(packed, 64)
    )


def test_pack_codes_matches_numpy(rng):
    rows = rng.integers(0, 256, size=(3, 32, 8)).astype(np.uint8)
    # bypass the native dispatch in packing.pack_codes: compare raw impls
    col = np.transpose(rows, (0, 2, 1))
    c0, c1 = col >> 4, col & 15
    lo, hi = packing.KPERM0, packing.KPERM0 + 16
    v0 = c0[..., lo] | (c0[..., hi] << 4)
    v1 = c1[..., lo] | (c1[..., hi] << 4)
    expect = np.concatenate([v0, v1], axis=-1).reshape(3, 8 * 32)
    np.testing.assert_array_equal(native.pack_codes(rows), expect)
    np.testing.assert_array_equal(native.unpack_codes(expect, 8), rows)


def test_crc32_matches_zlib(rng):
    data = rng.integers(0, 256, 10_000).astype(np.uint8).tobytes()
    assert native.crc32(data) == zlib.crc32(data)
    # streaming
    c = native.crc32(data[:5000])
    c = native.crc32(data[5000:], c)
    assert c == zlib.crc32(data)


def test_persistence_identical_with_and_without_native(tmp_path, rng):
    """An index saved with the native codecs must be byte-identical to one
    saved with the numpy fallback."""
    from rabitq_tpu import IvfRabitqIndex

    data = rng.standard_normal((200, 64)).astype(np.float32)
    index = IvfRabitqIndex.train(data, nlist=4, total_bits=7, seed=1, scan_dtype="f32")
    p1, p2 = tmp_path / "native.rbq", tmp_path / "numpy.rbq"
    index.save_to_path(p1)
    # force the numpy path
    import rabitq_tpu.native as nat

    saved_lib, saved_tried = nat._LIB, nat._TRIED
    try:
        nat._LIB, nat._TRIED = None, True
        index.save_to_path(p2)
    finally:
        nat._LIB, nat._TRIED = saved_lib, saved_tried
    assert p1.read_bytes() == p2.read_bytes()
