"""Gather-scan tests: the per-query probed-row gather path must match the
numpy naive oracle (the estimator contract every optimized path obeys,
reference ``tests.rs:164-343``) and the dense exact path, honor filters
and both metrics, and engage exactly when its budget gate says so.

The path is OPT-IN on hardware (measured 17x slower than the fused
bin-scan at 1M — XLA's TPU gather is element-rate-bound, see
``IvfRabitqIndex._gather_budget``); these tests pin its SEMANTICS so the
documented negative stays re-testable."""

import numpy as np
import pytest

from rabitq_tpu import IvfRabitqIndex, Metric, SearchParams
from rabitq_tpu.index.scan import gather_budget_bucket, gather_rows_bound

from test_ivf import _naive_search


@pytest.fixture(autouse=True)
def _enable_gather(monkeypatch):
    monkeypatch.setenv("RABITQ_GATHER", "1")


def _dataset(rng, n=600, dim=64):
    return rng.standard_normal((n, dim)).astype(np.float32)


def _build(rng, metric=Metric.L2, n=4000, nlist=64, dim=64):
    data = _dataset(rng, n, dim)
    index = IvfRabitqIndex.train(
        data, nlist=nlist, total_bits=7, metric=metric, seed=3,
        scan_dtype="fused8",
    )
    return data, index


def test_budget_helpers():
    sizes = [100, 50, 200, 10]
    assert gather_rows_bound(sizes, 1) == 200
    assert gather_rows_bound(sizes, 2) == 300
    assert gather_rows_bound(sizes, 4) == 360
    assert gather_budget_bucket(sizes, 2) == 512  # pow2 of 300
    import jax.numpy as jnp

    assert gather_budget_bucket(sizes, jnp.int32(2)) is None  # traced nprobe


@pytest.mark.parametrize("metric", [Metric.L2, Metric.InnerProduct])
def test_gather_matches_naive_oracle(metric, rng):
    data, index = _build(rng, metric)
    params = SearchParams(top_k=10, nprobe=4)
    assert index._gather_budget(params.nprobe) is not None, "gate must engage"
    for qi in range(8):
        fast = {h.id: h.score for h in index.search(data[qi], params)}
        naive = _naive_search(index, data[qi], params)
        overlap = len(set(fast) & set(i for i, _ in naive))
        assert overlap >= 9, (overlap, metric)
        for nid, nd in naive:
            if nid in fast:
                fd = fast[nid] if metric is Metric.L2 else -fast[nid]
                # reference 7-bit tier tolerance (tests.rs:23-63); the
                # gather dot rounds the query to bf16 exactly like the
                # production stage-2, so near-zero self-distances carry
                # absolute noise at the scale of the g-terms (~||q-c||^2)
                denom = max(abs(nd), abs(fd), 10.0)
                assert abs(fd - nd) / denom < 0.03, (nid, fd, nd)


def test_gather_f32_exact_vs_oracle(rng):
    """The gather machinery itself (probed-row enumeration + estimator)
    is EXACT: with f32 operands every oracle distance must reproduce to
    float accuracy — this isolates row-enumeration bugs from the bf16
    operand rounding the production mode shares with stage-2."""
    import jax.numpy as jnp

    from rabitq_tpu.index.scan import scan_kernel

    data, index = _build(rng)
    dev = index.device  # fused (cluster-sorted) layout
    cl_starts, cl_sizes = index._cluster_ranges()
    budget = index._gather_budget(4)
    assert budget is not None
    q = data[:8]
    q_rot = index.rotator.rotate(jnp.asarray(q))
    ids, dist = scan_kernel(
        q_rot, dev.centroids, dev.binary, dev.ex, dev.f_add, dev.f_rescale,
        dev.f_error, dev.f_add_ex, dev.f_rescale_ex, dev.cluster_of,
        dev.valid, dev.ids, nprobe=4,
        cl_starts=cl_starts, cl_sizes=cl_sizes,
        top_k=10, rerank=10, metric=index.metric, ex_bits=index.ex_bits,
        scan_dtype="f32", gather_rows=budget,
    )
    ids, dist = np.asarray(ids), np.asarray(dist)
    params = SearchParams(top_k=10, nprobe=4)
    for qi in range(8):
        naive = _naive_search(index, data[qi], params)
        assert list(ids[qi]) == [i for i, _ in naive]
        np.testing.assert_allclose(
            dist[qi], [d for _, d in naive], rtol=2e-5, atol=1e-4
        )


def test_gather_matches_dense_topk(rng):
    """Production fused8 gather vs the dense exact path: same probed
    set, same formula — the top-k sets agree up to bf16 rounding."""
    data, index = _build(rng)
    queries = data[:16]
    params = SearchParams(top_k=10, nprobe=4, rerank=500)
    assert index._gather_budget(params.nprobe) is not None
    g_ids, _ = index.batch_search_arrays(queries, params)

    # same index, dense exact mode (scan_dtype switch re-materializes the
    # device layout; the f32 path uses exact selection + full survivors)
    index.scan_dtype = "f32"
    index.approx_topk = False
    d_ids, _ = index.batch_search_arrays(queries, params)

    agree = np.mean(
        [len(set(g_ids[i]) & set(d_ids[i])) / 10 for i in range(len(queries))]
    )
    assert agree >= 0.9, agree


def test_gather_filtered_search(rng):
    data, index = _build(rng)
    params = SearchParams(top_k=10, nprobe=10)
    assert index._gather_budget(params.nprobe) is not None
    allowed = np.arange(0, len(data), 2)  # even ids only
    res = index.search_filtered(data[0], params, allowed)
    assert res, "filtered search returned nothing"
    assert all(h.id % 2 == 0 for h in res)
    assert 0 in [h.id for h in res]  # query 0 is even and finds itself


def test_gather_gate_declines(rng, monkeypatch):
    data, index = _build(rng)
    assert index._gather_budget(4) is not None
    # default-off: without the opt-in env the gate always declines
    monkeypatch.delenv("RABITQ_GATHER")
    assert index._gather_budget(4) is None
    monkeypatch.setenv("RABITQ_GATHER", "1")
    # budget past the row-count gate declines
    index._gather_cache = {}
    monkeypatch.setenv("RABITQ_GATHER_MAX", "1")
    assert index._gather_budget(4) is None
    monkeypatch.setenv("RABITQ_GATHER_MAX", "16384")
    # traced nprobe declines (sweeps stay single-program on fused paths)
    import jax.numpy as jnp

    index._gather_cache = {}
    assert index._gather_budget(jnp.int32(4)) is None


def test_mstg_gather_engages_and_agrees(rng, monkeypatch):
    """MSTG twin: the gather path must honor ef + ε-pruning + closure
    dedup — compare against the fused path on the same index."""
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    data = _dataset(rng, 4000, 32)
    cfg = MstgConfig(max_posting_size=128, rabitq_bits=7, use_rotator=False)
    index = MstgIndex.build(data, cfg, seed=4, scan_dtype="fused8")
    params = MstgSearchParams(top_k=10, ef_search=4, pruning_epsilon=0.6)
    assert index._gather_budget(params.ef_search) is not None, "gate must engage"
    g_hits = index.batch_search(data[:12], params)

    monkeypatch.setenv("RABITQ_GATHER", "0")
    index._gather_cache = {}
    assert index._gather_budget(params.ef_search) is None
    f_hits = index.batch_search(data[:12], params)

    for qi, (gh, fh) in enumerate(zip(g_hits, f_hits)):
        g_ids = [h.id for h in gh]
        assert qi in g_ids, f"query {qi} did not find itself (gather)"
        assert len(set(g_ids)) == len(g_ids), "dedup failed on gather path"
        overlap = len(set(g_ids) & set(h.id for h in fh))
        assert overlap >= 8, (qi, overlap)


def test_gather_single_query_and_batch_agree(rng):
    data, index = _build(rng)
    params = SearchParams(top_k=5, nprobe=4)
    batch = index.batch_search(data[:6], params)
    for qi in range(6):
        single = index.search(data[qi], params)
        assert [h.id for h in single] == [h.id for h in batch[qi]]
