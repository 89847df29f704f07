"""RBQ1 v3 persistence tests: exact round-trips, corruption detection
(tests.rs:394-519) and format-level invariants."""

import struct

import numpy as np
import pytest

from rabitq_tpu import (
    InvalidPersistence,
    IvfRabitqIndex,
    Metric,
    RotatorType,
    SearchParams,
)


def _index(rng, metric=Metric.L2, total_bits=7, rt=RotatorType.FhtKacRotator, n=300, dim=64):
    data = rng.standard_normal((n, dim)).astype(np.float32)
    return (
        IvfRabitqIndex.train(
            data, nlist=8, total_bits=total_bits, metric=metric,
            rotator_type=rt, seed=21, scan_dtype="f32",
        ),
        data,
    )


@pytest.mark.parametrize("total_bits", [1, 3, 7, 5])
@pytest.mark.parametrize("rt", [RotatorType.FhtKacRotator, RotatorType.MatrixRotator])
def test_save_load_roundtrip(total_bits, rt, tmp_path, rng):
    index, data = _index(rng, total_bits=total_bits, rt=rt)
    p = tmp_path / "index.rbq"
    index.save_to_path(p)
    loaded = IvfRabitqIndex.load_from_path(p, scan_dtype="f32")

    assert loaded.dim == index.dim
    assert loaded.padded_dim == index.padded_dim
    assert loaded.metric == index.metric
    assert loaded.ex_bits == index.ex_bits
    h0, h1 = index.host, loaded.host
    np.testing.assert_array_equal(h0.binary_bits, h1.binary_bits)
    np.testing.assert_array_equal(h0.ex_codes, h1.ex_codes)
    np.testing.assert_array_equal(h0.ids, h1.ids)
    np.testing.assert_array_equal(h0.cluster_offsets, h1.cluster_offsets)
    for f in ("f_add", "f_rescale", "f_error", "f_add_ex", "f_rescale_ex", "delta", "vl"):
        np.testing.assert_array_equal(getattr(h0, f), getattr(h1, f))
    np.testing.assert_array_equal(h0.centroids, h1.centroids)

    params = SearchParams(top_k=10, nprobe=8)
    r0 = index.batch_search(data[:4], params)
    r1 = loaded.batch_search(data[:4], params)
    for a, b in zip(r0, r1):
        assert [h.id for h in a] == [h.id for h in b]


def test_save_is_deterministic(tmp_path, rng):
    index, _ = _index(rng)
    p1, p2 = tmp_path / "a.rbq", tmp_path / "b.rbq"
    index.save_to_path(p1)
    index.save_to_path(p2)
    assert p1.read_bytes() == p2.read_bytes()


def test_corruption_detection(tmp_path, rng):
    index, _ = _index(rng)
    p = tmp_path / "index.rbq"
    index.save_to_path(p)
    blob = bytearray(p.read_bytes())
    blob[len(blob) // 2] ^= 0x40  # flip one bit in the middle
    p.write_bytes(bytes(blob))
    with pytest.raises(InvalidPersistence):
        IvfRabitqIndex.load_from_path(p)


def test_bad_magic_and_version(tmp_path, rng):
    index, _ = _index(rng)
    p = tmp_path / "index.rbq"
    index.save_to_path(p)
    blob = bytearray(p.read_bytes())
    blob2 = bytearray(blob)
    blob2[:4] = b"XXXX"
    p.write_bytes(bytes(blob2))
    with pytest.raises(InvalidPersistence):
        IvfRabitqIndex.load_from_path(p)
    blob3 = bytearray(blob)
    blob3[4:8] = struct.pack("<I", 99)
    p.write_bytes(bytes(blob3))
    with pytest.raises(InvalidPersistence):
        IvfRabitqIndex.load_from_path(p)


def test_header_layout(tmp_path, rng):
    """Spot-check the exact field layout against the reference writer
    (ivf.rs:1317-1373)."""
    index, _ = _index(rng, total_bits=7, rt=RotatorType.FhtKacRotator)
    p = tmp_path / "index.rbq"
    index.save_to_path(p)
    blob = p.read_bytes()
    assert blob[:4] == b"RBQ1"
    version, dim, padded = struct.unpack_from("<III", blob, 4)
    assert (version, dim, padded) == (3, 64, 64)
    metric_tag, rot_tag, ex_bits, total_bits = struct.unpack_from("<BBBB", blob, 16)
    assert (metric_tag, rot_tag, ex_bits, total_bits) == (0, 1, 6, 7)
    nvec, nclus, rot_len = struct.unpack_from("<QQQ", blob, 20)
    assert nvec == 300 and nclus == 8
    assert rot_len == 4 * padded // 8  # FhtKac stores only flip bits
