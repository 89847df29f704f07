"""Dataset upload encodings (utils/transfer.py).

The build paths upload large datasets reduced-precision over the tunnel
(bf16 halves, int8 quarters the bytes); these tests pin the decode
semantics and the auto policy, and check end-to-end recall is unharmed
at small scale (the 1M check lives in the bench artifact).
"""

import numpy as np
import pytest

from rabitq_tpu.utils.transfer import resolve_encoding, upload_dataset


def test_f32_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((513, 96)).astype(np.float32)
    dev, rep = upload_dataset(x, "f32")
    assert rep["encoding"] == "f32"
    assert rep["bytes"] == x.nbytes
    np.testing.assert_array_equal(np.asarray(dev), x)


def test_bf16_rounding_bound():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((300, 64)).astype(np.float32)
    dev, rep = upload_dataset(x, "bf16")
    assert rep["bytes"] == x.nbytes // 2
    got = np.asarray(dev)
    assert got.dtype == np.float32
    # bf16 keeps 8 significand bits: relative error < 2^-8
    np.testing.assert_allclose(got, x, rtol=2.0 ** -8, atol=1e-30)


def test_int8_rounding_bound():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((300, 64)).astype(np.float32)
    dev, rep = upload_dataset(x, "int8")
    assert rep["bytes"] == x.nbytes // 4
    got = np.asarray(dev)
    # symmetric per-row scale: error <= 0.5 * scale = 0.5 * rowmax / 127
    bound = 0.5 * np.abs(x).max(axis=1, keepdims=True) / 127.0
    assert np.all(np.abs(got - x) <= bound + 1e-7)


def test_chunked_equals_single_put():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1000, 32)).astype(np.float32)
    a, _ = upload_dataset(x, "bf16", chunk_rows=128)
    b, _ = upload_dataset(x, "bf16", chunk_rows=1 << 20)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_policy():
    small = np.zeros((4, 4), np.float32)
    assert resolve_encoding(small, "auto") == "f32"
    big = np.lib.stride_tricks.as_strided(
        np.zeros(1, np.float32), shape=(600 * 1024 * 1024 // 4,), strides=(0,)
    )
    assert resolve_encoding(big, "auto") == "bf16"
    with pytest.raises(ValueError):
        resolve_encoding(small, "f64")


def test_empty_dataset():
    dev, rep = upload_dataset(np.zeros((0, 8), np.float32), "bf16")
    assert dev.shape == (0, 8)
    assert rep["bytes"] == 0


def test_train_small_recall_unchanged_bf16():
    """End-to-end: a small IVF build from bf16-uploaded data finds the
    same neighbors as the f32 build at the test scale's tolerances."""
    from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType, SearchParams

    rng = np.random.default_rng(7)
    data = rng.standard_normal((2000, 64)).astype(np.float32)
    queries = rng.standard_normal((16, 64)).astype(np.float32)
    kw = dict(
        nlist=16, total_bits=7, metric=Metric.L2,
        rotator_type=RotatorType.FhtKacRotator, seed=3,
        use_faster_config=True, scan_dtype="f32",
    )
    a = IvfRabitqIndex.train(data, data_upload="f32", **kw)
    b = IvfRabitqIndex.train(data, data_upload="bf16", **kw)
    p = SearchParams(top_k=10, nprobe=16)
    ia, _ = a.batch_search_arrays(queries, p)
    ib, _ = b.batch_search_arrays(queries, p)
    # same candidates up to quantization-noise reordering: overlap >= 9/10
    overlap = np.mean([
        len(set(ia[i].tolist()) & set(ib[i].tolist())) / 10 for i in range(16)
    ])
    assert overlap >= 0.9
    assert a.build_report["upload"]["encoding"] == "f32"
    assert b.build_report["upload"]["encoding"] == "bf16"


def test_warm_session_returns_seconds():
    """warm_session pays the first-sync cost and reports it; on CPU it is
    effectively instant but must return a non-negative float (bench.py
    records it as session_warmup_s in the artifact)."""
    from rabitq_tpu.utils.transfer import warm_session

    s = warm_session()
    assert isinstance(s, float) and s >= 0.0
    # second call is warm and cheap
    assert warm_session() < 5.0
