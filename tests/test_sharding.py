"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rabitq_tpu import IvfRabitqIndex, Metric, SearchParams
from rabitq_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((1024, 64)).astype(np.float32)
    index = IvfRabitqIndex.train(data, nlist=8, total_bits=7, seed=1, scan_dtype="f32")
    return data, index


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_index_matches_single_chip(built):
    data, index = built
    mesh = sh.make_mesh(8)
    sharded = sh.ShardedIvfIndex(index, mesh)
    params = SearchParams(top_k=10, nprobe=8, rerank=512)
    ids_s, dist_s = sharded.batch_search_arrays(data[:8], params)
    ids_r, dist_r = index.batch_search_arrays(data[:8], params)
    for i in range(8):
        assert set(ids_s[i].tolist()) == set(ids_r[i].tolist())
    np.testing.assert_allclose(np.sort(dist_s, 1), np.sort(dist_r, 1), rtol=1e-5)


def test_sharded_kmeans_step_matches_global(built):
    data, _ = built
    mesh = sh.make_mesh(8)
    k = 8
    cents = data[:k].copy()
    (data_sh,) = sh.shard_rows(mesh, data)
    (c_rep,) = sh.replicate(mesh, cents)
    sums, counts, assign = sh.sharded_kmeans_step(data_sh, c_rep, mesh=mesh, k=k, block=64)
    # numpy reference
    d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    ref_assign = d2.argmin(1)
    np.testing.assert_array_equal(np.asarray(assign), ref_assign)
    ref_counts = np.bincount(ref_assign, minlength=k).astype(np.float32)
    np.testing.assert_allclose(np.asarray(counts), ref_counts)
    for c in range(k):
        np.testing.assert_allclose(
            np.asarray(sums)[c], data[ref_assign == c].sum(0), rtol=1e-4, atol=1e-3
        )


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_train_matches_single_chip_quality(rng=None):
    """ShardedIvfIndex.train must reach the same recall as a single-chip
    train on the same data (clusterings differ; quality must not)."""
    rng = np.random.default_rng(5)
    data = rng.standard_normal((1024, 64)).astype(np.float32)
    queries = data[:32]
    mesh = sh.make_mesh(8)
    sharded = sh.ShardedIvfIndex.train(
        data, nlist=16, total_bits=7, mesh=mesh, seed=3,
        use_faster_config=True, kmeans_iters=6, scan_dtype="f32",
    )
    params = SearchParams(top_k=5, nprobe=16)
    ids, dists = sharded.batch_search_arrays(queries, params)
    # nprobe = nlist + 7-bit codes: every query must find itself first
    assert all(ids[i][0] == i for i in range(32))
    assert np.isfinite(dists[:, 0]).all()
    # exact-t path compiles and works sharded too
    sharded_exact = sh.ShardedIvfIndex.train(
        data[:512], nlist=8, total_bits=5, mesh=mesh, seed=3,
        use_faster_config=False, kmeans_iters=4, scan_dtype="f32",
    )
    ids2, _ = sharded_exact.batch_search_arrays(data[:8], SearchParams(5, 8))
    assert all(ids2[i][0] == i for i in range(8))


def test_sharded_mstg_matches_single_chip():
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    rng = np.random.default_rng(9)
    data = rng.standard_normal((800, 64)).astype(np.float32)
    index = MstgIndex.build(
        data, MstgConfig(max_posting_size=64, faster_config=True), seed=1,
        scan_dtype="f32",
    )
    mesh = sh.make_mesh(8)
    smstg = sh.ShardedMstgIndex(index, mesh)
    params = MstgSearchParams(top_k=5, ef_search=16, pruning_epsilon=0.8)
    got = smstg.batch_search(data[:16], params)
    want = index.batch_search(data[:16], params)
    assert [[r.id for r in row] for row in got] == [
        [r.id for r in row] for row in want
    ]


def test_sharded_fused_matches_single_chip():
    """scan_dtype='fused' shards: each device runs the Pallas bin-scan on
    its TN-aligned row slice and the candidate merge stays one all_gather."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 64)).astype(np.float32)
    data = (
        centers[rng.integers(0, 8, 6000)]
        + 0.3 * rng.standard_normal((6000, 64)).astype(np.float32)
    ).astype(np.float32)
    index = IvfRabitqIndex.train(
        data, nlist=8, total_bits=7, seed=1, scan_dtype="fused"
    )
    mesh = sh.make_mesh(8)
    sharded = sh.ShardedIvfIndex(index, mesh)
    params = SearchParams(top_k=10, nprobe=8, rerank=256)
    ids_s, _ = sharded.batch_search_arrays(data[:8], params)
    ids_r, _ = index.batch_search_arrays(data[:8], params)
    overlaps = []
    for i in range(8):
        a, b = set(ids_s[i].tolist()) - {-1}, set(ids_r[i].tolist()) - {-1}
        assert ids_r[i][0] == ids_s[i][0], i  # top-1 must agree
        overlaps.append(len(a & b))
    # per-shard vs global survivor cuts can swap near-tied tail ranks
    assert np.mean(overlaps) >= 9.0, overlaps


def test_sharded_mstg_fused_matches_single_chip():
    """ShardedMstgIndex with a fused-scan index shards the Pallas kernel
    per posting-row slice (ef/epsilon pruning folded into the probe mask)."""
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 64)).astype(np.float32)
    data = (
        centers[rng.integers(0, 8, 5000)]
        + 0.3 * rng.standard_normal((5000, 64)).astype(np.float32)
    ).astype(np.float32)
    index = MstgIndex.build(
        data, MstgConfig(max_posting_size=800, faster_config=True), seed=2
    )
    index.scan_dtype = "fused"
    params = MstgSearchParams(top_k=10, ef_search=8, pruning_epsilon=0.8)
    ref = index.batch_search(data[:8], params)
    sharded = sh.ShardedMstgIndex(index, sh.make_mesh(8))
    got = sharded.batch_search(data[:8], params)
    for i, (a, b) in enumerate(zip(ref, got)):
        assert b and b[0].id == i, (i, b[:2])
        overlap = len({h.id for h in a} & {h.id for h in b})
        assert overlap >= 8, (i, overlap)


def test_sharded_fused_non_pow2_batch(built):
    """A batch whose 32-ceiling is not a multiple of the query tile (e.g.
    300 -> 320) must pad to a whole number of tiles inside fused_select
    instead of tripping the kernel's bq % tb assertion (round-2 advisor
    finding)."""
    rng = np.random.default_rng(8)
    data = rng.standard_normal((4096, 64)).astype(np.float32)
    idx = IvfRabitqIndex.train(
        data, nlist=8, total_bits=7, seed=1, scan_dtype="fused"
    )
    mesh = sh.make_mesh(8)
    sharded = sh.ShardedIvfIndex(idx, mesh)
    queries = np.concatenate([data] * 1)[:300]
    params = SearchParams(top_k=5, nprobe=8)
    ids, dists = sharded.batch_search_arrays(queries, params)
    assert ids.shape == (300, 5)
    assert all(ids[i][0] == i for i in range(32))


def test_sharded_filtered_search(built):
    """filter_ids shards with the rows on the sharded tier and matches the
    single-chip filtered search."""
    data, index = built
    mesh = sh.make_mesh(8)
    sharded = sh.ShardedIvfIndex(index, mesh)
    allowed = np.arange(100, 400)
    params = SearchParams(top_k=10, nprobe=8, rerank=512)
    ids_s, _ = sharded.batch_search_arrays(data[:8], params, filter_ids=allowed)
    found = set(ids_s.ravel().tolist()) - {-1}
    assert found and found <= set(allowed.tolist())
    ids_r, _ = index.batch_search_arrays(data[:8], params, filter_ids=allowed)
    for i in range(8):
        assert set(ids_s[i].tolist()) == set(ids_r[i].tolist()), i


def test_sharded_packed_matches_single_chip():
    """scan_dtype='packed' shards too: each device runs the packed-bitplane
    Pallas kernel on its TN-aligned row slice (this used to silently fall
    back to the dense bf16 program — round-2 known debt)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 64)).astype(np.float32)
    data = (
        centers[rng.integers(0, 8, 4000)]
        + 0.3 * rng.standard_normal((4000, 64)).astype(np.float32)
    ).astype(np.float32)
    index = IvfRabitqIndex.train(
        data, nlist=8, total_bits=7, seed=1, scan_dtype="packed"
    )
    mesh = sh.make_mesh(8)
    sharded = sh.ShardedIvfIndex(index, mesh)
    assert sharded._packed is not None and sharded._packed_mode
    # 5 queries: exercises the packed kernel's internal batch padding
    params = SearchParams(top_k=10, nprobe=8, rerank=256)
    ids_s, _ = sharded.batch_search_arrays(data[:5], params)
    ids_r, _ = index.batch_search_arrays(data[:5], params)
    overlaps = []
    for i in range(5):
        assert ids_s[i][0] == ids_r[i][0], i  # top-1 must agree
        a, b = set(ids_s[i].tolist()) - {-1}, set(ids_r[i].tolist()) - {-1}
        overlaps.append(len(a & b))
    # per-shard vs global survivor cuts can swap near-tied tail ranks
    assert np.mean(overlaps) >= 9.0, overlaps


def test_sharded_mstg_packed_matches_single_chip():
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    rng = np.random.default_rng(12)
    centers = rng.standard_normal((8, 64)).astype(np.float32)
    data = (
        centers[rng.integers(0, 8, 3000)]
        + 0.3 * rng.standard_normal((3000, 64)).astype(np.float32)
    ).astype(np.float32)
    index = MstgIndex.build(
        data, MstgConfig(max_posting_size=600, faster_config=True), seed=2
    )
    index.scan_dtype = "packed"
    params = MstgSearchParams(top_k=10, ef_search=8, pruning_epsilon=0.8)
    ref = index.batch_search(data[:8], params)
    sharded = sh.ShardedMstgIndex(index, sh.make_mesh(8))
    assert sharded._packed is not None and sharded._packed_mode
    got = sharded.batch_search(data[:8], params)
    for i, (a, b) in enumerate(zip(ref, got)):
        assert b and b[0].id == i, (i, b[:2])
        overlap = len({h.id for h in a} & {h.id for h in b})
        assert overlap >= 8, (i, overlap)
