"""Brute-force index tests, mirroring the reference BF suite
(tests.rs:912-1142): consistency with exact search, filtered search,
faster-config build, persistence, and smart-loader dispatch
(tests.rs:1143-1315)."""

import numpy as np
import pytest

from rabitq_tpu import (
    BruteForceRabitqIndex,
    BruteForceSearchParams,
    InvalidPersistence,
    IvfRabitqIndex,
    Metric,
    RabitqIndex,
    load_index,
)


def _data(rng, n=400, dim=64):
    return rng.standard_normal((n, dim)).astype(np.float32)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.InnerProduct])
def test_bf_finds_true_neighbors(metric, rng):
    data = _data(rng)
    index = BruteForceRabitqIndex.train(
        data, total_bits=7, metric=metric, seed=1, scan_dtype="f32"
    )
    params = BruteForceSearchParams(top_k=10)
    res = index.batch_search(data[:8], params)
    for qi, hits in enumerate(res):
        assert hits[0].id == qi
        scores = [h.score for h in hits]
        if metric is Metric.L2:
            assert scores == sorted(scores)
        else:
            assert scores == sorted(scores, reverse=True)


def test_bf_score_shift_parity(rng):
    """Reference BF reports ||v-q||^2 - ||q||^2 for L2
    (g_add hardcoded to 0, brute_force.rs:571)."""
    data = _data(rng, 100, 32)
    index = BruteForceRabitqIndex.train(data, total_bits=7, seed=2, scan_dtype="f32")
    q = data[0]
    hits = index.search(q, BruteForceSearchParams(top_k=5, rerank=100))
    true_shifted = np.sum((data[hits[0].id] - q) ** 2) - np.sum(q * q)
    assert abs(hits[0].score - true_shifted) < 0.15 * (abs(true_shifted) + 1.0)


def test_bf_filtered(rng):
    data = _data(rng, 200, 32)
    index = BruteForceRabitqIndex.train(data, total_bits=5, seed=3, scan_dtype="f32")
    allowed = np.arange(0, 200, 2)
    res = index.search_filtered(data[1], BruteForceSearchParams(top_k=10), allowed)
    assert res and all(h.id % 2 == 0 for h in res)
    assert 1 not in [h.id for h in res]


def test_bf_faster_config(rng):
    data = _data(rng, 200, 64)
    a = BruteForceRabitqIndex.train(
        data, total_bits=7, seed=4, use_faster_config=True, scan_dtype="f32"
    )
    res = a.batch_search(data[:8], BruteForceSearchParams(top_k=5))
    for qi, hits in enumerate(res):
        assert hits[0].id == qi


@pytest.mark.parametrize("total_bits", [1, 3, 7])
def test_bf_persistence_roundtrip(total_bits, tmp_path, rng):
    data = _data(rng, 150, 64)
    index = BruteForceRabitqIndex.train(
        data, total_bits=total_bits, seed=5, scan_dtype="f32"
    )
    p = tmp_path / "bf.rbf"
    index.save_to_path(p)
    loaded = BruteForceRabitqIndex.load_from_path(p, scan_dtype="f32")
    h0, h1 = index.host, loaded.host
    np.testing.assert_array_equal(h0.binary_bits, h1.binary_bits)
    np.testing.assert_array_equal(h0.ex_codes, h1.ex_codes)
    for f in ("delta", "vl", "f_add", "f_rescale", "f_error", "residual_norm",
              "f_add_ex", "f_rescale_ex"):
        np.testing.assert_array_equal(getattr(h0, f), getattr(h1, f))
    r0 = index.search(data[3], BruteForceSearchParams(top_k=5))
    r1 = loaded.search(data[3], BruteForceSearchParams(top_k=5))
    assert [h.id for h in r0] == [h.id for h in r1]


def test_bf_corruption(tmp_path, rng):
    data = _data(rng, 100, 64)
    index = BruteForceRabitqIndex.train(data, total_bits=7, seed=6, scan_dtype="f32")
    p = tmp_path / "bf.rbf"
    index.save_to_path(p)
    blob = bytearray(p.read_bytes())
    blob[len(blob) // 2] ^= 1
    p.write_bytes(bytes(blob))
    with pytest.raises(InvalidPersistence):
        BruteForceRabitqIndex.load_from_path(p)


def test_smart_loader(tmp_path, rng):
    data = _data(rng, 200, 64)
    ivf = IvfRabitqIndex.train(data, nlist=8, total_bits=7, seed=7, scan_dtype="f32")
    bf = BruteForceRabitqIndex.train(data, total_bits=7, seed=7, scan_dtype="f32")
    p1, p2 = tmp_path / "a.bin", tmp_path / "b.bin"
    ivf.save_to_path(p1)
    bf.save_to_path(p2)
    l1 = load_index(p1, scan_dtype="f32")
    l2 = load_index(p2, scan_dtype="f32")
    assert l1.is_ivf and not l1.is_brute_force
    assert l2.is_brute_force and not l2.is_ivf
    assert len(l1) == 200 and len(l2) == 200
    assert l1.as_ivf().cluster_count() == 8
    with pytest.raises(TypeError):
        l1.as_brute_force()
    # garbage file rejected
    p3 = tmp_path / "garbage.bin"
    p3.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(InvalidPersistence):
        RabitqIndex.load_from_path(p3)
