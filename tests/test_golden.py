"""Golden persisted-format tests.

The committed files in tests/golden/ were written once and pin the RBQ1 v3
and RBF1 v1 byte formats: any codec change that breaks compatibility with
previously-written (or reference-written) indices fails here, not in
production. The reference's own round-trip tests can't catch cross-version
drift; these can.
"""

import os

import numpy as np
import pytest

from rabitq_tpu import (
    BruteForceRabitqIndex,
    BruteForceSearchParams,
    IvfRabitqIndex,
    Metric,
    SearchParams,
    load_index,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def tiny_data():
    return np.load(os.path.join(GOLDEN, "tiny_data.npy"))


def test_golden_ivf_loads_and_searches(tiny_data):
    index = IvfRabitqIndex.load_from_path(
        os.path.join(GOLDEN, "tiny_ivf.rbq"), scan_dtype="f32"
    )
    assert index.dim == 64 and index.cluster_count() == 4 and len(index) == 96
    assert index.ex_bits == 6 and index.metric is Metric.L2
    res = index.batch_search(tiny_data[:8], SearchParams(top_k=5, nprobe=4))
    for qi, hits in enumerate(res):
        assert hits[0].id == qi


def test_golden_bf_loads_and_searches(tiny_data):
    index = BruteForceRabitqIndex.load_from_path(
        os.path.join(GOLDEN, "tiny_bf.rbf"), scan_dtype="f32"
    )
    assert index.dim == 64 and len(index) == 96
    assert index.ex_bits == 2 and index.metric is Metric.InnerProduct
    hits = index.search(tiny_data[3], BruteForceSearchParams(top_k=5))
    ips = tiny_data @ tiny_data[3]
    assert hits[0].id == int(np.argmax(ips))


def test_golden_rewrite_is_byte_identical(tiny_data, tmp_path):
    """load -> save must reproduce the golden bytes exactly (writer and
    reader agree on every field)."""
    for name, loader in (
        ("tiny_ivf.rbq", IvfRabitqIndex.load_from_path),
        ("tiny_bf.rbf", BruteForceRabitqIndex.load_from_path),
    ):
        src = os.path.join(GOLDEN, name)
        index = loader(src)
        out = tmp_path / name
        index.save_to_path(out)
        assert out.read_bytes() == open(src, "rb").read(), f"{name} drifted"


def test_golden_smart_loader(tiny_data):
    assert load_index(os.path.join(GOLDEN, "tiny_ivf.rbq")).is_ivf
    assert load_index(os.path.join(GOLDEN, "tiny_bf.rbf")).is_brute_force
