"""Fused EXACT scan mode: the bin kernel streams the int8 TOTAL plane
with the extended factors, so bin minima are final distances and no
stage-2 survivor gather runs. Default-on for eligible configs — these
tests pin oracle parity, agreement with the two-stage path, and the
MSTG twin (dedup + ε-pruning intact)."""

import numpy as np
import pytest

from rabitq_tpu import IvfRabitqIndex, Metric, SearchParams

from test_ivf import _naive_search


def _dataset(rng, n=3000, dim=128):
    return rng.standard_normal((n, dim)).astype(np.float32)


def _build(rng, metric=Metric.L2, scan_dtype="fused8"):
    data = _dataset(rng)
    index = IvfRabitqIndex.train(
        data, nlist=48, total_bits=7, metric=metric, seed=3,
        scan_dtype=scan_dtype,
    )
    return data, index


def test_exact_mode_engages(rng):
    _, index = _build(rng)
    assert index._fused_exact_ok()
    index.scan_dtype = "bf16"
    assert not index._fused_exact_ok()
    index.scan_dtype = "fused8"
    # non-128-aligned quant dims work too: the fused layout width-pads
    # the refine plane (layout.py) and the scan zero-pads the query
    data2 = _dataset(rng, 500, 64)
    index2 = IvfRabitqIndex.train(
        data2, nlist=8, total_bits=7, seed=1, scan_dtype="fused8",
    )
    assert index2.padded_dim % 128 != 0 and index2._fused_exact_ok()
    assert index2.device.ex.shape[1] % 128 == 0
    res = index2.search(data2[0], SearchParams(top_k=5, nprobe=8))
    assert res[0].id == 0


@pytest.mark.parametrize("metric", [Metric.L2, Metric.InnerProduct])
def test_exact_matches_naive_oracle(metric, rng):
    data, index = _build(rng, metric)
    assert index._fused_exact_ok()
    params = SearchParams(top_k=10, nprobe=6)
    for qi in range(8):
        fast = {h.id: h.score for h in index.search(data[qi], params)}
        naive = _naive_search(index, data[qi], params)
        overlap = len(set(fast) & set(i for i, _ in naive))
        assert overlap >= 9, (overlap, metric)
        for nid, nd in naive:
            if nid in fast:
                fd = fast[nid] if metric is Metric.L2 else -fast[nid]
                # bf16 query rounding on the in-kernel dot (stage-2
                # precision): absolute noise scales with the g-term
                # magnitude E||q-c||^2 ~ 2*dim, so near-zero
                # self-distances need a dim-scaled floor
                denom = max(abs(nd), abs(fd), 2.0 * data.shape[1] * 0.35)
                assert abs(fd - nd) / denom < 0.03, (nid, fd, nd)


def test_exact_agrees_with_two_stage(rng, monkeypatch):
    data, index = _build(rng)
    queries = data[:16]
    params = SearchParams(top_k=10, nprobe=6)
    e_ids, e_dist = index.batch_search_arrays(queries, params)

    monkeypatch.setenv("RABITQ_FUSED_EXACT", "0")
    assert not index._fused_exact_ok()
    t_ids, t_dist = index.batch_search_arrays(queries, params)

    agree = np.mean(
        [len(set(e_ids[i]) & set(t_ids[i])) / 10 for i in range(len(queries))]
    )
    assert agree >= 0.9, agree
    # distances of common ids agree to operand-rounding tolerance (both
    # paths round q to bf16 but accumulate differently; absolute noise
    # scales with the g-term magnitude ~ 2*dim)
    floor = 2.0 * queries.shape[1] * 0.35
    for i in range(len(queries)):
        t_map = dict(zip(t_ids[i].tolist(), t_dist[i].tolist()))
        for j, rid in enumerate(e_ids[i]):
            if int(rid) in t_map and np.isfinite(e_dist[i, j]):
                a, b = e_dist[i, j], t_map[int(rid)]
                assert abs(a - b) / max(abs(a), abs(b), floor) < 0.02


def test_exact_filtered(rng):
    data, index = _build(rng)
    params = SearchParams(top_k=10, nprobe=48)
    allowed = np.arange(0, len(data), 2)
    res = index.search_filtered(data[0], params, allowed)
    assert res and all(h.id % 2 == 0 for h in res)
    assert 0 in [h.id for h in res]


def test_exact_mstg(rng, monkeypatch):
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    data = _dataset(rng, 3000, 128)
    # rotated: quant_dim pads to 128-aligned, so exact mode is eligible
    cfg = MstgConfig(max_posting_size=128, rabitq_bits=7, use_rotator=True)
    index = MstgIndex.build(data, cfg, seed=4, scan_dtype="fused8")
    assert index._fused_exact_ok()
    params = MstgSearchParams(top_k=10, ef_search=6, pruning_epsilon=0.6)
    e_hits = index.batch_search(data[:12], params)

    monkeypatch.setenv("RABITQ_FUSED_EXACT", "0")
    t_hits = index.batch_search(data[:12], params)

    for qi, (eh, th) in enumerate(zip(e_hits, t_hits)):
        e_ids = [h.id for h in eh]
        assert qi in e_ids, f"query {qi} did not find itself (exact)"
        assert len(set(e_ids)) == len(e_ids), "dedup failed on exact path"
        overlap = len(set(e_ids) & set(h.id for h in th))
        assert overlap >= 8, (qi, overlap)
