"""Fused Pallas stage-1 scan + selection (ops/pallas_fused_scan.py).

Runs in interpret mode on the CPU test backend; the kernel's bin semantics
are exact (bins[b, l] = min over rows n == l (mod L)), so it is verified
against a dense-math reference, and the end-to-end scan_dtype="fused" path
is checked against the f32 oracle index.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from rabitq_tpu import IvfRabitqIndex, Metric, SearchParams
from rabitq_tpu.ops.pallas_fused_scan import (
    BIG,
    TN,
    fused_bin_scan,
    n_bins,
    tile_cluster_blocks,
)
from rabitq_tpu.ops.pallas_scan import pack_bitplanes, packed_bytes, permute_query


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_bins_match_dense_reference(rng):
    """bins_val[b, l] must equal the modulo-L column minimum of the dense
    lower-bound matrix, with matching argmin rows."""
    n, d, c, b = 4 * TN, 128, 24, 32
    l_bins = n_bins()

    binary = rng.integers(0, 2, (n, d)).astype(np.int8)
    f_add = rng.normal(size=n).astype(np.float32)
    f_rescale = rng.normal(size=n).astype(np.float32)
    f_error = np.abs(rng.normal(size=n)).astype(np.float32)
    # cluster-sorted ids over a contiguous range per tile
    cluster_of = np.sort(rng.integers(0, c, n)).astype(np.int32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    k1x = (-0.5 * q.sum(axis=1)).astype(np.float32)
    g_add = rng.normal(size=(b, c)).astype(np.float32)
    g_err = np.abs(rng.normal(size=(b, c))).astype(np.float32)
    probe = rng.random((b, c)) < 0.5

    valid = np.ones(n, bool)
    c_blk = tile_cluster_blocks(cluster_of, valid)

    c_pad = max(256, ((c + 127) // 128) * 128)
    g1 = np.full((b, c_pad), BIG, np.float32)
    g1[:, :c] = np.where(probe, g_add, BIG)
    g2 = np.zeros((b, c_pad), np.float32)
    g2[:, :c] = g_err

    packed = pack_bitplanes(jnp.asarray(binary), d)
    q_perm = permute_query(jnp.asarray(q), d)
    vals, idxs, offered = fused_bin_scan(
        packed,
        q_perm,
        jnp.asarray(f_add),
        jnp.asarray(f_rescale),
        jnp.asarray(f_error),
        jnp.asarray(cluster_of),
        jnp.asarray(k1x),
        jnp.asarray(g1, jnp.bfloat16),
        jnp.asarray(g2, jnp.bfloat16),
        jnp.asarray(c_blk),
    )
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    # measured offered-row counters == rows in probed clusters
    probed_rows = probe[:, cluster_of].sum(axis=1)
    np.testing.assert_array_equal(np.asarray(offered).sum(axis=1), probed_rows)

    # dense reference with the SAME precision choices (bf16 g-planes)
    g1_bf = g1.astype(jnp.bfloat16).astype(np.float32)
    g2_bf = g2.astype(jnp.bfloat16).astype(np.float32)
    bdot = q @ binary.astype(np.float32).T  # [B, N]
    gterm = g1_bf[:, cluster_of] - f_error[None, :] * g2_bf[:, cluster_of]
    lb = f_add[None, :] + f_rescale[None, :] * (bdot + k1x[:, None]) + gterm

    folded = lb.reshape(b, n // l_bins, l_bins) if n % l_bins == 0 else None
    if folded is None:
        pad = (-n) % l_bins
        lb_p = np.pad(lb, ((0, 0), (0, pad)), constant_values=BIG)
        folded = lb_p.reshape(b, -1, l_bins)
    ref_vals = folded.min(axis=1)
    # kernel computes the dot in bf16 operands with f32 accumulation while
    # the reference dot is f32: near-tied rows can swap the bin argmin,
    # shifting the bin value by up to one bf16 rounding gap (~0.1 here)
    np.testing.assert_allclose(
        np.where(ref_vals > BIG / 2, 0, ref_vals),
        np.where(vals > BIG / 2, 0, vals),
        rtol=2e-2,
        atol=0.2,
    )
    # argmin row agreement wherever the min is unambiguous (ties/rounding
    # can legitimately differ): check 95%+ agreement
    ref_idx = folded.argmin(axis=1) * l_bins + np.arange(l_bins)[None, :]
    ref_idx = np.where(ref_vals > BIG / 2, -1, ref_idx)
    agree = np.mean((idxs == ref_idx) | (ref_idx == -1))
    assert agree > 0.95, agree


def test_tile_cluster_blocks_span_check():
    n = 2 * TN
    cluster_of = np.arange(n) // 2  # 2-row clusters: span TN/2 > 128
    with pytest.raises(ValueError):
        tile_cluster_blocks(cluster_of, np.ones(n, bool))


def test_fused_ivf_matches_f32_oracle(rng):
    """End-to-end scan_dtype='fused' search equals the exact f32 path
    (same index, same params) within re-rank rounding."""
    n, dim = 3000, 96
    centers = rng.normal(size=(12, dim)).astype(np.float32)
    data = (
        centers[rng.integers(0, 12, n)]
        + 0.3 * rng.normal(size=(n, dim)).astype(np.float32)
    ).astype(np.float32)
    index = IvfRabitqIndex.train(
        data, nlist=12, total_bits=7, metric=Metric.L2, seed=5, scan_dtype="f32"
    )
    queries = data[:32]
    params = SearchParams(top_k=10, nprobe=12, rerank=256)
    ids_f32, dist_f32 = index.batch_search_arrays(queries, params)

    index.scan_dtype = "fused"  # triggers cluster-sorted re-materialization
    ids_fused, dist_fused = index.batch_search_arrays(queries, params)

    overlap = np.mean(
        [
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(ids_f32, ids_fused)
        ]
    )
    assert overlap >= 0.95, overlap
    # for ids both paths returned, the re-ranked distances must agree
    # (same stage-2 estimator; fused uses bf16 operands, so the absolute
    # error floor is ~2^-9 * dot magnitude — visible on near-zero
    # self-distances)
    for row in range(len(queries)):
        ref = dict(zip(ids_f32[row].tolist(), dist_f32[row].tolist()))
        for i, dv in zip(ids_fused[row].tolist(), dist_fused[row].tolist()):
            if i in ref:
                np.testing.assert_allclose(dv, ref[i], rtol=5e-2, atol=0.15)


def test_fused_filtered_and_ip(rng):
    """Filter masks fold into f_add; InnerProduct g-terms flow through."""
    n, dim = 2000, 64
    data = rng.normal(size=(n, dim)).astype(np.float32)
    index = IvfRabitqIndex.train(
        data, nlist=8, total_bits=7, metric=Metric.InnerProduct, seed=2,
        scan_dtype="fused",
    )
    params = SearchParams(top_k=5, nprobe=8)
    allowed = np.arange(100, 200)
    ids, _ = index.batch_search_arrays(data[:4], params, filter_ids=allowed)
    found = set(ids.ravel().tolist()) - {-1}
    assert found and found <= set(allowed.tolist())


def test_fused_mstg_matches_bf16(rng):
    """MSTG with scan_dtype='fused' (cluster-sorted posting rows, dynamic
    ef/epsilon pruning folded into the probe mask) matches the dense path."""
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    n, dim = 2500, 64
    centers = rng.normal(size=(10, dim)).astype(np.float32)
    data = (
        centers[rng.integers(0, 10, n)]
        + 0.25 * rng.normal(size=(n, dim)).astype(np.float32)
    ).astype(np.float32)
    cfg = MstgConfig(max_posting_size=400, faster_config=True)
    index = MstgIndex.build(data, cfg, seed=4)
    params = MstgSearchParams(top_k=10, ef_search=8, pruning_epsilon=0.6)
    ref = index.batch_search(data[:16], params)

    index.scan_dtype = "fused"
    got = index.batch_search(data[:16], params)
    overlap = np.mean(
        [
            len({h.id for h in a} & {h.id for h in b}) / max(len(a), 1)
            for a, b in zip(ref, got)
        ]
    )
    assert overlap >= 0.9, overlap


@pytest.mark.parametrize("total_bits", [1, 8])
def test_fused_bit_width_edges(total_bits, rng):
    """ex_bits=0 (no refinement: stage 2 re-scores with the 1-bit
    estimator) and ex_bits=7 (raw ex plane, two-gather formula) both flow
    through the fused selection."""
    n, dim = 2000, 64
    centers = rng.normal(size=(8, dim)).astype(np.float32)
    data = (
        centers[rng.integers(0, 8, n)]
        + 0.3 * rng.normal(size=(n, dim)).astype(np.float32)
    ).astype(np.float32)
    f32 = IvfRabitqIndex.train(
        data, nlist=8, total_bits=total_bits, seed=6, scan_dtype="f32"
    )
    params = SearchParams(top_k=10, nprobe=8, rerank=256)
    ids_ref, _ = f32.batch_search_arrays(data[:16], params)
    f32.scan_dtype = "fused"
    ids_fused, _ = f32.batch_search_arrays(data[:16], params)
    overlap = np.mean(
        [len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(ids_ref, ids_fused)]
    )
    # 1-bit estimates are noisy; parity with the exact-selection f32 path
    # is what matters, not absolute recall
    assert overlap >= (0.8 if total_bits == 1 else 0.9), overlap


def test_fused8_matches_fused(rng):
    """scan_dtype='fused8' (int8-quantized stage-1 query on the MXU) must
    track the bf16 fused path — codes are {0,1} so only the query rounds
    (the dense path's int8 mode has the same contract)."""
    n, dim = 3000, 96
    centers = rng.normal(size=(12, dim)).astype(np.float32)
    data = (
        centers[rng.integers(0, 12, n)]
        + 0.3 * rng.normal(size=(n, dim)).astype(np.float32)
    ).astype(np.float32)
    index = IvfRabitqIndex.train(
        data, nlist=12, total_bits=7, metric=Metric.L2, seed=5,
        scan_dtype="fused",
    )
    params = SearchParams(top_k=10, nprobe=12, rerank=256)
    ids_f, _ = index.batch_search_arrays(data[:24], params)
    index.scan_dtype = "fused8"  # same sorted layout: no re-materialization
    ids_8, _ = index.batch_search_arrays(data[:24], params)
    overlap = np.mean(
        [len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(ids_f, ids_8)]
    )
    assert overlap >= 0.95, overlap


def test_fused_diagnostics_measured_in_kernel(rng):
    """search_with_diagnostics on a fused index reports counters measured
    INSIDE the production Pallas kernel (no dense-oracle reroute): probed
    rows must equal estimated + skipped, and probed must match an
    independent host count of the rows in probed clusters."""
    data = rng.normal(size=(1500, 64)).astype(np.float32)
    index = IvfRabitqIndex.train(data, nlist=6, total_bits=7, seed=9,
                                 scan_dtype="fused")
    params = SearchParams(top_k=10, nprobe=3)
    res, diag = index.search_with_diagnostics(data[0], params)
    assert res and res[0].id == 0
    assert diag.estimated > 0
    assert diag.extended_evaluations == diag.estimated  # survivors re-ranked
    # independent host count: rank clusters for this query, sum the sizes
    # of the top-nprobe (the kernel's offered-row counter must agree)
    q_rot = np.asarray(index._rotate_jit(np.asarray(data[:1], np.float32)))[0]
    cents = index._centroids_np
    d2 = ((cents - q_rot) ** 2).sum(axis=1)
    probed_clusters = np.argsort(d2)[:3]
    sizes = np.diff(index._offsets)
    expect_probed = int(sizes[probed_clusters].sum())
    assert diag.estimated + diag.skipped_by_lower_bound == expect_probed


def test_fused_degenerate_geometry_falls_back(rng):
    """Average cluster smaller than TN/128 rows cannot satisfy the fused
    kernel's 128-cluster tile window; the index must warn and serve via
    the dense path instead of raising at cblk construction."""
    n, dim = 1024, 32
    data = rng.normal(size=(n, dim)).astype(np.float32)
    # nlist=512 over 1024 rows: ~2-row clusters, far below TN/128 = 4
    index = IvfRabitqIndex.train(
        data, nlist=512, total_bits=3, seed=3, scan_dtype="fused"
    )
    ids, _ = index.batch_search_arrays(data[:4], SearchParams(top_k=3, nprobe=512))
    assert index.scan_dtype == "bf16"  # downgraded, not crashed
    assert all(ids[i][0] == i for i in range(4))


def test_compacted_tiles_match_dense(rng):
    """fused_select with a probed-tile budget must return exactly the
    dense walk's survivors: unlisted tiles contain only BIG-masked rows."""
    from rabitq_tpu.ops.pallas_fused_scan import fused_select

    c, rows_per = 64, 256  # 2 clusters per TN=512 tile, span <= 2
    n = c * rows_per
    d, b = 128, 32
    binary = rng.integers(0, 2, (n, d)).astype(np.int8)
    f_add = rng.normal(size=n).astype(np.float32)
    f_rescale = rng.normal(size=n).astype(np.float32)
    f_error = np.abs(rng.normal(size=n)).astype(np.float32)
    cluster_of = np.repeat(np.arange(c, dtype=np.int32), rows_per)
    q = rng.normal(size=(b, d)).astype(np.float32)
    k1x = (-0.5 * q.sum(axis=1)).astype(np.float32)
    g_add = rng.normal(size=(b, c)).astype(np.float32)
    g_err = np.abs(rng.normal(size=(b, c))).astype(np.float32)
    # each query probes 2 clusters; the block union is 8 distinct clusters
    probe = np.zeros((b, c), bool)
    for i in range(b):
        probe[i, [i % 4, 32 + i % 4]] = True

    c_blk = tile_cluster_blocks(cluster_of, np.ones(n, bool))
    packed = pack_bitplanes(jnp.asarray(binary), d)

    def run(max_tiles):
        idx, ok, _probed = fused_select(
            jnp.asarray(q),
            packed,
            jnp.asarray(f_add),
            jnp.asarray(f_rescale),
            jnp.asarray(f_error),
            jnp.asarray(cluster_of),
            jnp.asarray(k1x),
            jnp.asarray(g_add),
            jnp.asarray(g_err),
            jnp.asarray(probe),
            jnp.asarray(c_blk),
            rerank=64,
            padded_dim=d,
            max_tiles=max_tiles,
        )
        return np.asarray(idx), np.asarray(ok)

    idx_d, ok_d = run(None)
    idx_c, ok_c = run(16)  # safe: union spans <= 8 clusters * 2 + tail
    for row in range(b):
        assert set(idx_d[row][ok_d[row]].tolist()) == set(
            idx_c[row][ok_c[row]].tolist()
        ), row


def test_compaction_auto_enables_end_to_end(rng, monkeypatch):
    """With many tiles and a tiny nprobe the wrapper enables probed-tile
    compaction automatically; results must match the dense tile walk."""
    from rabitq_tpu.ops.pallas_fused_scan import TN

    c, rows_per, dim = 160, TN, 32  # 160 tiles, 1 cluster per tile
    n = c * rows_per
    centroids = rng.normal(size=(c, dim)).astype(np.float32)
    assign = np.repeat(np.arange(c), rows_per)
    data = (
        centroids[assign] + 0.2 * rng.normal(size=(n, dim))
    ).astype(np.float32)
    index = IvfRabitqIndex.train_with_clusters(
        data, centroids, assign, total_bits=5, seed=3,
        use_faster_config=True, scan_dtype="fused",
    )
    params = SearchParams(top_k=5, nprobe=2)
    queries = data[::7777][:8].copy()
    assert index._fused_max_tiles(params.nprobe, batch=8) is not None
    ids_c, dist_c = index.batch_search_arrays(queries, params)

    monkeypatch.setenv("RABITQ_FUSED_COMPACT", "0")
    index._max_tiles_cache = {}
    assert index._fused_max_tiles(params.nprobe, batch=8) is None
    ids_d, dist_d = index.batch_search_arrays(queries, params)
    for row in range(len(queries)):
        assert set(ids_c[row].tolist()) == set(ids_d[row].tolist()), row


def test_fused_layout_drops_binary_plane(rng):
    """Fused layouts with a TOTAL refine plane (1 <= ex_bits <= 6) carry
    no dense binary plane (stage 1 reads packed bitplanes, stage 2 the
    total plane); the host download derives binary = total >> ex_bits, so
    a layout-mode switch round-trips exactly."""
    data = rng.normal(size=(3000, 96)).astype(np.float32)
    index = IvfRabitqIndex.train(
        data, nlist=12, total_bits=7, seed=5, scan_dtype="fused"
    )
    dev = index.device
    assert dev.binary is None and dev.packed is not None
    params = SearchParams(top_k=10, nprobe=12, rerank=256)
    ids_f, _ = index.batch_search_arrays(data[:8], params)
    index.scan_dtype = "bf16"  # host download (binary derived) + rebuild
    ids_d, _ = index.batch_search_arrays(data[:8], params)
    overlap = np.mean(
        [len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(ids_f, ids_d)]
    )
    assert overlap >= 0.9, overlap

    # the edge bit-widths keep the plane: ex_bits=0 re-scores with the
    # 1-bit estimator, ex_bits=7 needs the two-gather formula
    for bits in (1, 8):
        idx = IvfRabitqIndex.train(
            data[:1000], nlist=4, total_bits=bits, seed=2, scan_dtype="fused"
        )
        assert idx.device.binary is not None, bits


def _compact_geometry(rng, c=160, dim=32):
    """160 one-cluster-per-tile clusters: enough tiles at nprobe=2 for the
    expected-cost gate to enable compaction (same shape as
    test_compaction_auto_enables_end_to_end)."""
    n = c * TN
    centroids = rng.normal(size=(c, dim)).astype(np.float32)
    assign = np.repeat(np.arange(c), TN)
    data = (centroids[assign] + 0.2 * rng.normal(size=(n, dim))).astype(
        np.float32
    )
    return data, centroids, assign


def test_sliced_max_tiles_is_a_valid_bound(rng):
    """For random cluster-size distributions and TN-aligned slices, the
    shared per-slice budget must cover the tiles any nprobe-sized probe
    set can touch in any slice (the adversarial case the sharded and
    streamed tiers rely on)."""
    from rabitq_tpu.ops.pallas_fused_scan import sliced_max_tiles

    for trial in range(6):
        trng = np.random.default_rng(100 + trial)
        c = int(trng.integers(40, 300))
        sizes = trng.integers(0, 4 * TN, size=c).astype(np.int64)
        n = int(sizes.sum())
        if n < 4 * TN:
            continue
        off = np.concatenate([[0], np.cumsum(sizes)])
        n_slices = int(trng.integers(2, 6))
        slab = ((n // n_slices) // TN + 1) * TN
        slices = [(i * slab, min((i + 1) * slab, n)) for i in range(n_slices)]
        slices = [(s, e) for s, e in slices if e > s]
        nprobe, bt = 2, 32
        budget = sliced_max_tiles(sizes, nprobe, slices, bt)
        if budget is None:
            continue  # gate chose the dense walk: nothing to bound
        nonempty = np.flatnonzero(sizes > 0)
        u = min(len(nonempty), bt * nprobe)
        for _ in range(50):
            probe = trng.choice(nonempty, size=u, replace=False)
            for s, e in slices:
                tiles = set()
                for cl in probe:
                    lo, hi = max(off[cl], s), min(off[cl + 1], e)
                    if hi > lo:
                        tiles.update(
                            range((lo - s) // TN, (hi - 1 - s) // TN + 1)
                        )
                assert len(tiles) <= budget, (trial, s, e, len(tiles), budget)


def test_sharded_fused_compaction_matches_disabled(rng, monkeypatch):
    """The sharded wrapper's per-slab compaction budget (sliced_max_tiles)
    must leave results identical to the dense tile walk on every shard."""
    import rabitq_tpu.parallel.sharding as sh

    data, centroids, assign = _compact_geometry(rng)
    index = IvfRabitqIndex.train_with_clusters(
        data, centroids, assign, total_bits=5, seed=3,
        use_faster_config=True, scan_dtype="fused",
    )
    mesh = sh.make_mesh(8)
    sharded = sh.ShardedIvfIndex(index, mesh)
    params = SearchParams(top_k=5, nprobe=2)
    queries = data[::7777][:8].copy()
    assert sharded._fused_max_tiles(params.nprobe, 8) is not None
    ids_c, dist_c = sharded.batch_search_arrays(queries, params)

    monkeypatch.setenv("RABITQ_FUSED_COMPACT", "0")
    sharded._max_tiles_cache = {}
    assert sharded._fused_max_tiles(params.nprobe, 8) is None
    ids_d, dist_d = sharded.batch_search_arrays(queries, params)
    np.testing.assert_array_equal(ids_c, ids_d)
    np.testing.assert_allclose(dist_c, dist_d, rtol=1e-5, atol=1e-5)


def test_streamed_fused_compaction_matches_disabled(rng, monkeypatch):
    """The streamed tier's per-chunk compaction budget must leave results
    identical to the dense walk on every chunk (chunk-local bounds: the
    whole-index bound used to exceed a chunk's tile count and disable
    compaction outright)."""
    from rabitq_tpu.index.streaming import StreamedIvfIndex

    data, centroids, assign = _compact_geometry(rng)
    index = IvfRabitqIndex.train_with_clusters(
        data, centroids, assign, total_bits=5, seed=3,
        use_faster_config=True, scan_dtype="fused",
    )
    streamed = StreamedIvfIndex(index, chunk_rows=16 * TN)
    assert streamed.n_chunks > 1
    params = SearchParams(top_k=5, nprobe=2)
    queries = data[::3333][:8].copy()
    assert streamed._fused_max_tiles(params.nprobe, 8) is not None
    ids_c, dist_c = streamed.batch_search_arrays(queries, params)

    monkeypatch.setenv("RABITQ_FUSED_COMPACT", "0")
    streamed._max_tiles_cache = {}
    assert streamed._fused_max_tiles(params.nprobe, 8) is None
    ids_d, dist_d = streamed.batch_search_arrays(queries, params)
    np.testing.assert_array_equal(ids_c, ids_d)
    np.testing.assert_allclose(dist_c, dist_d, rtol=1e-5, atol=1e-5)
