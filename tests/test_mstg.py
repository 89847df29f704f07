"""MSTG tests, mirroring the reference MSTG coverage: balanced-clustering
size invariants (mstg/clustering.rs:273-327), closure RNG rule
(mstg/closure.rs:110-190), build/search smoke (mstg/index.rs:372-420) and
save/load round-trip (mstg/io.rs:332-396)."""

import numpy as np
import pytest

from rabitq_tpu import (
    InvalidPersistence,
    MstgConfig,
    MstgIndex,
    MstgSearchParams,
    Metric,
    ScalarPrecision,
)
from rabitq_tpu.index.mstg.clustering import hierarchical_cluster
from rabitq_tpu.index.mstg.closure import closure_assign


def _data(rng, n=2000, dim=48):
    centers = rng.standard_normal((12, dim)).astype(np.float32) * 3
    a = rng.integers(0, 12, n)
    return (centers[a] + 0.4 * rng.standard_normal((n, dim))).astype(np.float32)


def test_hierarchical_clustering_respects_max_size(rng):
    data = _data(rng, 3000, 32)
    cs = hierarchical_cluster(data, max_cluster_size=400, branching_factor=4)
    sizes = np.array([m.size for m in cs.members])
    assert sizes.sum() == 3000
    assert sizes.max() <= 400
    # reasonable balance (reference asserts CoV < 0.6 on its test data)
    all_idx = np.concatenate(cs.members)
    assert np.array_equal(np.sort(all_idx), np.arange(3000))


def test_global_polish_improves_partition(rng):
    """The global Lloyd polish (clustering._global_polish) must keep the
    exact-partition + max-size invariants and strictly reduce the mean
    distance-to-assigned-centroid vs the un-polished subtree partition
    (the level-synchronous recursion assigns rows only within their
    parent's subtree; the polish fixes the split-boundary rows)."""
    data = _data(rng, 4000, 32)

    def cost(cs):
        return float(
            np.mean(
                [
                    np.sum((data[m] - data[m].mean(axis=0)) ** 2, axis=-1).mean()
                    for m in cs.members
                    if m.size
                ]
            )
        )

    raw = hierarchical_cluster(
        data, max_cluster_size=150, branching_factor=4, refine_iters=0
    )
    polished = hierarchical_cluster(
        data, max_cluster_size=150, branching_factor=4, refine_iters=4
    )
    for cs in (raw, polished):
        sizes = np.array([m.size for m in cs.members])
        assert sizes.max() <= 150
        assert np.array_equal(
            np.sort(np.concatenate(cs.members)), np.arange(4000)
        )
    assert cost(polished) <= cost(raw) * 1.001


def test_closure_assignment_properties(rng):
    data = _data(rng, 500, 24)
    cents = hierarchical_cluster(data, 100, 4).centroids
    members = closure_assign(data, cents, epsilon=0.2, max_replicas=4)
    counts = np.zeros(500, np.int64)
    for m in members:
        counts[m] += 1
    assert counts.min() >= 1  # every vector assigned at least once
    assert counts.max() <= 4  # capped at max_replicas
    # closest centroid always included
    d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    closest = d2.argmin(1)
    for vec in range(0, 500, 37):
        c = closest[vec]
        assert vec in members[c], f"vector {vec} missing from closest cluster"


@pytest.mark.parametrize("refine", [True, False])
def test_mstg_build_and_search(refine, rng):
    data = _data(rng, 1500, 32)
    cfg = MstgConfig(
        max_posting_size=300, branching_factor=4, rabitq_bits=7, refine_ex=refine
    )
    index = MstgIndex.build(data, cfg, scan_dtype="f32")
    assert len(index) == 1500
    assert index.replication_factor() >= 1.0
    # refine=False reproduces the reference's 1-bit-only scan
    # (mstg/index.rs:216-331): at dim=32 the 1-bit estimator noise is
    # ~sqrt(960/32) ~ 5x what it is on GIST-sized vectors, so only a
    # top-100 self-recovery bound is inherent; ex refinement (our default)
    # tightens it to top-10.
    k = 10 if refine else 100
    res = index.batch_search(data[:10], MstgSearchParams(ef_search=300, pruning_epsilon=0.8, top_k=k))
    for qi, hits in enumerate(res):
        ids = [h.id for h in hits]
        assert qi in ids, f"query {qi} not found (refine={refine})"
        assert len(ids) == len(set(ids)), "duplicate ids in results"
        scores = [h.score for h in hits]
        assert scores == sorted(scores)


def test_mstg_recall_vs_exact(rng):
    data = _data(rng, 2000, 32)
    queries = _data(rng, 16, 32)
    cfg = MstgConfig(max_posting_size=300, branching_factor=4, rabitq_bits=7)
    index = MstgIndex.build(data, cfg, scan_dtype="f32")
    d2 = ((data[None, :, :] - queries[:, None, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    res = index.batch_search(queries, MstgSearchParams(ef_search=400, pruning_epsilon=3.0, top_k=10))
    recall = np.mean(
        [len(set(h.id for h in res[i]) & set(gt[i])) / 10 for i in range(16)]
    )
    assert recall >= 0.85, recall


def test_mstg_search_presets():
    hr = MstgSearchParams.high_recall(5)
    assert (hr.ef_search, hr.pruning_epsilon) == (300, 0.8)
    ll = MstgSearchParams.low_latency(5)
    assert (ll.ef_search, ll.pruning_epsilon) == (50, 0.4)


def test_mstg_persistence_roundtrip(tmp_path, rng):
    data = _data(rng, 800, 32)
    cfg = MstgConfig(
        max_posting_size=200,
        branching_factor=4,
        rabitq_bits=5,
        centroid_precision=ScalarPrecision.BF16,
    )
    index = MstgIndex.build(data, cfg, scan_dtype="f32")
    p = tmp_path / "index.mstg"
    index.save_to_path(p)
    loaded = MstgIndex.load_from_path(p, scan_dtype="f32")
    assert loaded.dim == index.dim
    assert loaded.config.rabitq_bits == 5
    assert loaded.config.centroid_precision == ScalarPrecision.BF16
    h0, h1 = index.host, loaded.host
    np.testing.assert_array_equal(h0.binary_bits, h1.binary_bits)
    np.testing.assert_array_equal(h0.ex_codes, h1.ex_codes)
    np.testing.assert_array_equal(h0.ids, h1.ids)
    np.testing.assert_array_equal(h0.list_offsets, h1.list_offsets)
    np.testing.assert_array_equal(h0.centroids, h1.centroids)
    r0 = index.search(data[5], MstgSearchParams.balanced(10))
    r1 = loaded.search(data[5], MstgSearchParams.balanced(10))
    assert [h.id for h in r0] == [h.id for h in r1]
    # corruption detection
    blob = bytearray(p.read_bytes())
    blob[len(blob) // 3] ^= 0x10
    p.write_bytes(bytes(blob))
    with pytest.raises(InvalidPersistence):
        MstgIndex.load_from_path(p)


def test_mstg_memory_usage(rng):
    data = _data(rng, 500, 32)
    index = MstgIndex.build(
        data, MstgConfig(max_posting_size=200, branching_factor=4), scan_dtype="f32"
    )
    assert index.memory_usage() > 0
    assert index.posting_list_count() >= 3


def test_mstg_lazy_host_download(rng):
    """Device-built indexes keep the big code planes device-resident
    (``host=None``) until something actually needs host bytes; the lazy
    ``_download_host`` inversion must reproduce exactly what an
    eagerly-constructed index computes (search parity + code-plane
    invariants), and metadata accessors must not force the download."""
    data = _data(rng, 1200, 32)
    cfg = MstgConfig(max_posting_size=250, branching_factor=4, rabitq_bits=7)
    index = MstgIndex.build(data, cfg, scan_dtype="f32")
    assert index._host is None  # build keeps planes on device

    # metadata + search do not materialize host copies
    params = MstgSearchParams(ef_search=200, pruning_epsilon=3.0, top_k=10)
    _ = (len(index), index.total_rows, index.posting_list_count(),
         index.memory_usage(), index.replication_factor())
    res_lazy = index.batch_search(data[:8], params)
    assert index._host is None

    # first .host access downloads; planes obey the code-format invariants
    h = index.host
    assert index._host is not None
    assert h.binary_bits.dtype == np.uint8 and set(np.unique(h.binary_bits)) <= {0, 1}
    ex_bits = cfg.rabitq_bits - 1
    assert h.ex_codes.max() < (1 << ex_bits)
    assert h.binary_bits.shape == (index.total_rows, index.quant_dim)

    # an index constructed EAGERLY from the downloaded host must search
    # identically (the download inverted the device layout correctly)
    eager = MstgIndex(cfg, index.dim, h, scan_dtype="f32", rotator=index.rotator)
    res_eager = eager.batch_search(data[:8], params)
    for a, b in zip(res_lazy, res_eager):
        assert [x.id for x in a] == [x.id for x in b]
        np.testing.assert_allclose(
            [x.score for x in a], [x.score for x in b], rtol=1e-5, atol=1e-5
        )


def test_mstg_lazy_host_mode_switch(rng):
    """Switching scan_dtype on a device-built index re-assembles the
    layout; the host capture from the OLD layout must keep results
    consistent across modes."""
    data = _data(rng, 1000, 32)
    cfg = MstgConfig(max_posting_size=250, branching_factor=4, rabitq_bits=7)
    index = MstgIndex.build(data, cfg, scan_dtype="bf16")
    params = MstgSearchParams(ef_search=300, pruning_epsilon=3.0, top_k=10)
    res_a = index.batch_search(data[:8], params)
    index.scan_dtype = "f32"
    res_b = index.batch_search(data[:8], params)
    overlap = np.mean([
        len({h.id for h in a} & {h.id for h in b}) / 10
        for a, b in zip(res_a, res_b)
    ])
    assert overlap >= 0.9, overlap


def test_mstg_returns_full_topk_under_replication(rng):
    """Regression: cross-list dedup must not shorten results when closure
    replication is high. Boundary vectors (midpoints between far-apart
    centers) satisfy the RNG rule and replicate into multiple lists."""
    dim = 24
    centers = rng.standard_normal((8, dim)).astype(np.float32) * 10
    a = rng.integers(0, 8, 2600)
    blob = centers[a] + 0.1 * rng.standard_normal((2600, dim))
    pairs = rng.integers(0, 8, size=(400, 2))
    mid = (
        0.5 * (centers[pairs[:, 0]] + centers[pairs[:, 1]])
        + 0.1 * rng.standard_normal((400, dim))
    )
    data = np.concatenate([blob, mid]).astype(np.float32)
    cfg = MstgConfig(
        max_posting_size=600, branching_factor=4, rabitq_bits=7,
        closure_epsilon=3.0, max_replicas=8,
    )
    index = MstgIndex.build(data, cfg, scan_dtype="f32")
    assert index.replication_factor() > 1.1, index.replication_factor()
    res = index.batch_search(
        data[:4], MstgSearchParams(ef_search=300, pruning_epsilon=3.0, top_k=50)
    )
    for hits in res:
        assert len(hits) == 50, len(hits)


def test_mstg_with_rotator_improves_recall(rng):
    """TPU extension: rotated MSTG quantization (use_rotator=True) must beat
    the reference's original-space quantization on correlated data, and
    round-trip through persistence."""
    import tempfile, os

    n, dim = 3000, 48
    # coordinate-correlated data (a few heavy directions) — the case where
    # the missing rotation hurts the reference design
    basis = rng.standard_normal((4, dim)).astype(np.float32)
    coef = rng.standard_normal((n, 4)).astype(np.float32)
    data = (coef @ basis * 3 + 0.3 * rng.standard_normal((n, dim))).astype(np.float32)
    queries = data[:16]
    d2 = ((data[None, :, :] - queries[:, None, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]

    def recall(index):
        res = index.batch_search(
            queries, MstgSearchParams(ef_search=300, pruning_epsilon=3.0, top_k=10)
        )
        return np.mean([len(set(h.id for h in res[i]) & set(gt[i])) / 10 for i in range(16)])

    base_cfg = dict(max_posting_size=400, branching_factor=4, rabitq_bits=5)
    plain = MstgIndex.build(data, MstgConfig(**base_cfg), scan_dtype="f32")
    rotated = MstgIndex.build(
        data, MstgConfig(**base_cfg, use_rotator=True), scan_dtype="f32"
    )
    r_plain, r_rot = recall(plain), recall(rotated)
    assert r_rot >= r_plain - 0.02, (r_plain, r_rot)
    assert r_rot >= 0.85, (r_plain, r_rot)

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "rot.mstg")
        rotated.save_to_path(p)
        loaded = MstgIndex.load_from_path(p, scan_dtype="f32")
        assert loaded.config.use_rotator and loaded.rotator is not None
        assert loaded.quant_dim == rotated.quant_dim
        a = rotated.search(data[3], MstgSearchParams.balanced(5))
        b = loaded.search(data[3], MstgSearchParams.balanced(5))
        assert [h.id for h in a] == [h.id for h in b]


# ---------------------------------------------------------------------------
# scalar quantization of centroids (mstg/scalar_quant.rs parity)
# ---------------------------------------------------------------------------


def test_bf16_conversion_error_under_1pct():
    """Mirrors scalar_quant.rs:88-103: round-to-nearest-even fp32->bf16
    keeps <1% relative error, and matches ml_dtypes' IEEE bfloat16."""
    import ml_dtypes
    from rabitq_tpu.index.mstg.scalar_quant import (
        bf16_bits_to_fp32,
        fp32_to_bf16_bits,
    )

    values = np.array([1.0, -1.0, 0.5, 100.0, 0.001, np.pi], np.float32)
    bits = fp32_to_bf16_bits(values)
    rec = bf16_bits_to_fp32(bits)
    err = np.abs(values - rec) / np.maximum(np.abs(values), 1e-6)
    assert (err < 0.01).all(), err
    # bit-for-bit agreement with the IEEE round-to-nearest-even reference
    np.testing.assert_array_equal(
        rec, values.astype(ml_dtypes.bfloat16).astype(np.float32)
    )


def test_bf16_vector_distance_error_under_1pct():
    """Mirrors scalar_quant.rs:105-131."""
    from rabitq_tpu.index.mstg.scalar_quant import (
        bf16_bits_to_fp32,
        fp32_to_bf16_bits,
    )

    v1 = np.full(128, 1.0, np.float32)
    v2 = np.full(128, 2.0, np.float32)
    q1 = bf16_bits_to_fp32(fp32_to_bf16_bits(v1))
    q2 = bf16_bits_to_fp32(fp32_to_bf16_bits(v2))
    exact = float(((v1 - v2) ** 2).sum())
    approx = float(((q1 - q2) ** 2).sum())
    assert abs(exact - approx) / exact < 0.01


@pytest.mark.parametrize("prec", list(ScalarPrecision))
def test_centroid_precision_changes_stored_bytes(prec, rng):
    """ScalarPrecision drives the stored centroid values AND the persisted
    bytes (round-2 verdict: it was accounting-only); save/load round-trips
    the quantized centroids exactly and search still works."""
    import os
    import tempfile

    from rabitq_tpu.index.mstg.scalar_quant import quantize_centroids

    data = _data(rng, 600, 48)
    cfg = MstgConfig(
        max_posting_size=128, faster_config=True, centroid_precision=prec
    )
    index = MstgIndex.build(data, cfg, seed=3)
    cents = index.host.centroids
    # the stored centroids are exactly representable in the precision
    _, requant = quantize_centroids(cents, prec)
    np.testing.assert_array_equal(cents, requant)
    if prec is not ScalarPrecision.FP32:
        # a genuine rounding happened somewhere (not plain f32 passthrough)
        assert cents.dtype == np.float32

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "idx.mstg")
        index.save_to_path(path)
        loaded = MstgIndex.load_from_path(path)
        np.testing.assert_array_equal(loaded.host.centroids, cents)
        assert loaded.config.centroid_precision is prec
        res = loaded.batch_search(data[:4], MstgSearchParams(top_k=3, ef_search=8))
        assert all(row and row[0].id == i for i, row in enumerate(res))


def test_centroid_precision_file_sizes(rng):
    """bf16/int8 centroid blocks shrink the persisted file."""
    import os
    import tempfile

    data = _data(rng, 500, 64)
    sizes = {}
    with tempfile.TemporaryDirectory() as td:
        for prec in (ScalarPrecision.FP32, ScalarPrecision.BF16, ScalarPrecision.INT8):
            cfg = MstgConfig(
                max_posting_size=128, faster_config=True, centroid_precision=prec
            )
            index = MstgIndex.build(data, cfg, seed=3)
            path = os.path.join(td, f"{prec.value}.mstg")
            index.save_to_path(path)
            sizes[prec] = os.path.getsize(path)
    assert sizes[ScalarPrecision.BF16] < sizes[ScalarPrecision.FP32]
    assert sizes[ScalarPrecision.INT8] < sizes[ScalarPrecision.BF16]


def test_reference_mstg_writer_roundtrip(rng):
    """save_to_path(format='reference') emits the reference's bincode v1
    body: it round-trips through ref_io's parser field-for-field and
    re-encoding the loaded index reproduces the file byte-for-byte."""
    import os
    import tempfile

    data = _data(rng, 800, 48)
    cfg = MstgConfig(max_posting_size=128, faster_config=True)
    index = MstgIndex.build(data, cfg, seed=5)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ref_idx")
        index.save_to_path(p, format="reference")
        loaded = MstgIndex.load_from_path(p + ".mstg")
        h0, h1 = index.host, loaded.host
        np.testing.assert_array_equal(h1.binary_bits, h0.binary_bits)
        np.testing.assert_array_equal(h1.ex_codes, h0.ex_codes)
        np.testing.assert_array_equal(h1.ids, h0.ids)
        np.testing.assert_array_equal(h1.list_offsets, h0.list_offsets)
        np.testing.assert_array_equal(h1.centroids, h0.centroids)
        for f in ("f_add", "f_rescale", "f_add_ex", "f_rescale_ex",
                  "delta", "vl", "f_error", "residual_norm"):
            np.testing.assert_array_equal(getattr(h1, f), getattr(h0, f))
        # the v1 format carries no refine_ex/use_rotator extensions
        assert loaded.config.refine_ex is False
        # byte idempotence: encode(parse(f)) == f
        p2 = os.path.join(td, "again")
        loaded.save_to_path(p2, format="reference")
        with open(p + ".mstg", "rb") as a, open(p2 + ".mstg", "rb") as b:
            assert a.read() == b.read()
        # reference files load with refine_ex=False (1-bit estimates only,
        # L2-clamped ties at 0.0), so demand parity with the ORIGINAL
        # index searched under the same reference semantics, not self-hits
        index.config.refine_ex = False
        res = loaded.batch_search(data[:4], MstgSearchParams(top_k=5, ef_search=16))
        want = index.batch_search(data[:4], MstgSearchParams(top_k=5, ef_search=16))
        assert [[h.id for h in row] for row in res] == [
            [h.id for h in row] for row in want
        ]


def test_reference_mstg_writer_rejects_rotated(rng):
    from rabitq_tpu.errors import InvalidPersistence

    data = _data(rng, 400, 32)
    cfg = MstgConfig(max_posting_size=128, faster_config=True, use_rotator=True)
    index = MstgIndex.build(data, cfg, seed=5)
    with pytest.raises(InvalidPersistence):
        index.save_to_path("/tmp/should_not_exist", format="reference")


def test_mstg_diagnostics_show_epsilon_binding(rng):
    """search_with_diagnostics exposes the ε-pruning effect: a tight
    epsilon probes fewer posting-list rows than a loose one at equal ef
    (mstg/index.rs:349-362 dynamic pruning)."""
    data = _data(rng, 2000, 32)  # 12 well-separated blobs
    cfg = MstgConfig(max_posting_size=256, faster_config=True)
    index = MstgIndex.build(data, cfg, seed=1, scan_dtype="f32")
    loose = MstgSearchParams(top_k=5, ef_search=8, pruning_epsilon=10.0)
    tight = MstgSearchParams(top_k=5, ef_search=8, pruning_epsilon=0.02)
    res_l, d_l = index.search_with_diagnostics(data[0], loose)
    res_t, d_t = index.search_with_diagnostics(data[0], tight)
    assert res_l and res_l[0].id == 0
    assert res_t and res_t[0].id == 0
    probed_l = d_l.estimated + d_l.skipped_by_lower_bound
    probed_t = d_t.estimated + d_t.skipped_by_lower_bound
    assert 0 < probed_t < probed_l

    # fused path reports kernel-measured counters with the same semantics
    index.scan_dtype = "fused"
    res_f, d_f = index.search_with_diagnostics(data[0], tight)
    assert res_f and res_f[0].id == 0
    assert d_f.estimated + d_f.skipped_by_lower_bound == probed_t

    # packed-path regression: diagnostics used to inline (and drift from)
    # _scan_planes, crashing on scan_dtype="packed" with packed=None
    index.scan_dtype = "packed"
    res_p, d_p = index.search_with_diagnostics(data[0], tight)
    assert res_p and res_p[0].id == 0
    assert d_p.estimated + d_p.skipped_by_lower_bound == probed_t


def test_mstg_pipelined_and_upload_encodings(rng):
    """batch_search_pipelined == batch_search, and reduced-precision query
    uploads (bf16/int8, the MSTG twin of IvfRabitqIndex.upload_dtype) stay
    within the encoding's rounding of the f32 results."""
    data = _data(rng)
    index = MstgIndex.build(
        data, MstgConfig(max_posting_size=200, faster_config=True), seed=3
    )
    params = MstgSearchParams(top_k=10, ef_search=12, pruning_epsilon=0.8)
    queries = data[:70]  # not a pow2: exercises block padding
    ref = index.batch_search(queries, params)
    piped = index.batch_search_pipelined(queries, params, batch_size=32)
    assert [[r.id for r in row] for row in piped] == [
        [r.id for r in row] for row in ref
    ]
    # superblock uploads (put granularity > dispatch granularity)
    superblocked = index.batch_search_pipelined(
        queries, params, batch_size=16, upload_block=64
    )
    assert [[r.id for r in row] for row in superblocked] == [
        [r.id for r in row] for row in ref
    ]
    for upload in ("bf16", "int8", "int4"):
        index.upload_dtype = upload
        got = index.batch_search(queries, params)
        if upload == "int4":
            # at this 48-d the ~max|q|/14 rounding interacts with the
            # ε-pruning threshold too strongly for a tight overlap bar
            # (error/signal ~ 1/sqrt(d); 960-d measures at parity —
            # BENCHMARKS.md "int4 query uploads"). Pin what a CPU test
            # CAN pin: the device nibble decode equals the host codec.
            from rabitq_tpu.index.scan import pack_int4_queries

            packed, scale = pack_int4_queries(np.ascontiguousarray(queries))
            b8 = packed.astype(np.int8)
            lo = ((b8 << 4).astype(np.int8) >> 4).astype(np.float32)
            hi = (b8 >> 4).astype(np.float32)
            deq = np.stack([lo, hi], axis=-1).reshape(len(queries), -1)[
                :, : queries.shape[1]
            ] * scale[:, None]
            index.upload_dtype = "f32"
            manual = index.batch_search(deq.astype(np.float32), params)
            index.upload_dtype = upload
            assert [[r.id for r in row] for row in got] == [
                [r.id for r in row] for row in manual
            ]
        else:
            overlap = np.mean(
                [
                    len({r.id for r in a} & {r.id for r in b})
                    for a, b in zip(ref, got)
                ]
            )
            assert overlap >= 9.0, (upload, overlap)
        piped_lo = index.batch_search_pipelined(queries, params, batch_size=32)
        assert [[r.id for r in row] for row in piped_lo] == [
            [r.id for r in row] for row in got
        ]
    index.upload_dtype = "f32"


def test_mstg_arrays_pipelined_matches_lists(rng):
    """batch_search_arrays_pipelined (raw arrays, no SearchResult
    materialization — the high-k serving path) returns exactly the
    pipelined list results, on a replicated index so the device dedup
    is in the loop."""
    data = _data(rng)
    index = MstgIndex.build(
        data,
        MstgConfig(max_posting_size=200, faster_config=True, closure_epsilon=0.5),
        seed=3,
    )
    params = MstgSearchParams(top_k=10, ef_search=12, pruning_epsilon=0.8)
    queries = data[:70]
    ref = index.batch_search_pipelined(queries, params, batch_size=32)
    ids, dists = index.batch_search_arrays_pipelined(
        queries, params, batch_size=32
    )
    sign = 1.0  # L2: scores are the distances
    for row_ref, row_ids, row_d in zip(ref, ids, dists):
        got = [
            (int(i), sign * float(dd))
            for i, dd in zip(row_ids, row_d)
            if i >= 0 and np.isfinite(dd)
        ]
        assert [r.id for r in row_ref] == [g[0] for g in got]
        np.testing.assert_allclose(
            [r.score for r in row_ref], [g[1] for g in got], rtol=1e-6
        )


def test_closure_rng_rule_structural_on_isotropic_blobs(rng):
    """On isotropic blobs the closure RNG rule rejects every second
    assignment at ANY epsilon: noise is orthogonal to centroid
    differences, so dist^2(v, c_j) ~ dist^2(v, c_i) + dist^2(c_i, c_j)
    exceeds the RNG bound. Midpoints of cross-cluster point pairs sit
    BETWEEN centroids and pass the rule — the mechanism bench.py's
    replicated variant uses (BENCHMARKS.md 'Closure replication')."""
    from rabitq_tpu.index.mstg.closure import closure_assign

    dim, per = 64, 50
    centers = rng.standard_normal((8, dim)).astype(np.float32) * 1.0
    blobs = np.concatenate(
        [c + 0.3 * rng.standard_normal((per, dim)).astype(np.float32) for c in centers]
    )
    # isotropic: replication 1.0 even at a huge epsilon
    lists = closure_assign(blobs, centers, epsilon=5.0, max_replicas=4)
    assert sum(len(m) for m in lists) == len(blobs)
    # midpoints between cluster pairs: replicated by construction
    ia = rng.integers(0, per, 40)
    ib = rng.integers(per, 2 * per, 40)
    bridged = np.concatenate([blobs, 0.5 * (blobs[ia] + blobs[ib])])
    lists_b = closure_assign(bridged, centers, epsilon=0.9, max_replicas=4)
    assert sum(len(m) for m in lists_b) > len(bridged)


def test_mstg_resident_query_cache_matches_batch_search(rng):
    """upload_queries + batch_search_resident == batch_search across
    ef/ε configs (queries cross the link once for the whole sweep)."""
    data = _data(rng)
    index = MstgIndex.build(
        data, MstgConfig(max_posting_size=200, faster_config=True), seed=3
    )
    queries = data[:70]
    index.upload_dtype = "int8"
    qc = index.upload_queries(queries)
    for ef, eps in ((8, 0.6), (16, 0.8)):
        params = MstgSearchParams(top_k=10, ef_search=ef, pruning_epsilon=eps)
        got = index.batch_search_resident(qc, params, batch_size=32)
        ref = index.batch_search(queries, params)
        assert [[r.id for r in row] for row in got] == [
            [r.id for r in row] for row in ref
        ]
    index.upload_dtype = "f32"


def test_dedup_topk_device_matches_host_oracle(rng):
    """The on-device closure dedup (`MstgIndex._dedup_topk_device`, run
    inside the scan dispatch so the result fetch is [B, top_k]) keeps
    exactly the rows the host-side `_dedup_results` oracle keeps: first
    (= best, results arrive best-first) occurrence per id, in order."""
    b, r, top_k = 7, 25, 6
    ids = rng.integers(0, 12, (b, r)).astype(np.int64)
    dists = np.sort(rng.random((b, r)).astype(np.float32), axis=1)
    # sprinkle invalid entries: negative ids and inf distances
    ids[rng.random((b, r)) < 0.2] = -1
    dists[rng.random((b, r)) < 0.1] = np.inf
    # one row fully invalid
    ids[3] = -1

    out_ids, out_d = map(
        np.asarray, MstgIndex._dedup_topk_device(ids, dists, top_k=top_k)
    )
    assert out_ids.shape == (b, top_k)

    valid = (ids >= 0) & np.isfinite(dists)
    for i in range(b):
        seen, expect = set(), []
        for j in range(r):
            if valid[i, j] and ids[i, j] not in seen:
                seen.add(ids[i, j])
                expect.append((ids[i, j], dists[i, j]))
        expect = expect[:top_k]
        got = [
            (out_ids[i, j], out_d[i, j])
            for j in range(top_k)
            if out_ids[i, j] >= 0
        ]
        assert [g[0] for g in got] == [e[0] for e in expect]
        np.testing.assert_allclose(
            [g[1] for g in got], [e[1] for e in expect], rtol=1e-6
        )
        # padding slots are inert
        for j in range(len(got), top_k):
            assert out_ids[i, j] == -1 and np.isinf(out_d[i, j])


def test_dedup_topk_device_pads_small_candidate_sets(rng):
    """top_k larger than the candidate axis pads with (-1, inf)."""
    ids = np.array([[3, 3, 5]], np.int64)
    dists = np.array([[0.1, 0.2, 0.3]], np.float32)
    out_ids, out_d = map(
        np.asarray, MstgIndex._dedup_topk_device(ids, dists, top_k=8)
    )
    assert out_ids.shape == (1, 8)
    assert list(out_ids[0][:2]) == [3, 5]
    assert all(out_ids[0][2:] == -1) and np.isinf(out_d[0][2:]).all()


# ---------------------------------------------------------------------------
# InnerProduct end-to-end (mstg/config.rs:50 carries the metric;
# mstg/distance.rs:14-119 scores IP — navigation stays L2 like the
# reference's DistL2 centroid selection, only the scoring flips sign)
# ---------------------------------------------------------------------------


def _ip_gt(data, queries, k):
    return np.argsort(-(queries @ data.T), axis=1)[:, :k]


@pytest.mark.parametrize("scan_dtype", ["f32", "fused", "fused8"])
def test_mstg_inner_product_matches_oracle(scan_dtype, rng):
    data = _data(rng, 2000, 32)
    queries = _data(rng, 16, 32)
    cfg = MstgConfig(
        max_posting_size=300, branching_factor=4, rabitq_bits=7,
        metric=Metric.InnerProduct,
    )
    index = MstgIndex.build(data, cfg, scan_dtype=scan_dtype)
    gt = _ip_gt(data, queries, 10)
    res = index.batch_search(
        queries, MstgSearchParams(ef_search=400, pruning_epsilon=3.0, top_k=10)
    )
    recall = np.mean(
        [len(set(h.id for h in res[i]) & set(gt[i])) / 10 for i in range(16)]
    )
    assert recall >= 0.85, (scan_dtype, recall)
    for hits in res:
        scores = [h.score for h in hits]
        # IP scores are the (positive-is-better) inner products, descending
        assert scores == sorted(scores, reverse=True)
        assert len({h.id for h in hits}) == len(hits)


def test_mstg_inner_product_score_values(rng):
    """Returned IP scores approximate the true inner products (estimator
    tolerance at 7 bits ~ 3%, tests.rs:23-63)."""
    data = _data(rng, 1200, 32)
    cfg = MstgConfig(
        max_posting_size=300, branching_factor=4, rabitq_bits=7,
        metric=Metric.InnerProduct,
    )
    index = MstgIndex.build(data, cfg, scan_dtype="f32")
    q = data[7]
    res = index.search(q, MstgSearchParams(ef_search=400, pruning_epsilon=3.0, top_k=10))
    assert any(h.id == 7 for h in res)
    for h in res:
        true_ip = float(data[h.id] @ q)
        denom = max(abs(true_ip), 1.0)
        assert abs(h.score - true_ip) / denom < 0.05, (h.id, h.score, true_ip)


def test_mstg_inner_product_persistence_roundtrip(tmp_path, rng):
    data = _data(rng, 800, 32)
    cfg = MstgConfig(
        max_posting_size=200, branching_factor=4, rabitq_bits=7,
        metric=Metric.InnerProduct,
    )
    index = MstgIndex.build(data, cfg, scan_dtype="f32")
    p = tmp_path / "ip.mstg"
    index.save_to_path(p)
    loaded = MstgIndex.load_from_path(p, scan_dtype="f32")
    assert loaded.config.metric is Metric.InnerProduct
    mp = MstgSearchParams(ef_search=300, pruning_epsilon=1.0, top_k=10)
    r0 = index.search(data[5], mp)
    r1 = loaded.search(data[5], mp)
    assert [h.id for h in r0] == [h.id for h in r1]
    np.testing.assert_allclose(
        [h.score for h in r0], [h.score for h in r1], rtol=1e-6
    )


def test_no_replica_fast_path(rng):
    """closure_epsilon=0 assigns each vector to exactly one list: the
    serving dispatch must skip the device dedup (measured 3.6 ms per
    b=256 block at 1M, tools/mstg_decompose.py) and return top_k
    directly — results identical to the dedup path, ids unique."""
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    data = rng.standard_normal((2500, 64)).astype(np.float32)
    cfg = MstgConfig(
        max_posting_size=128, rabitq_bits=7, use_rotator=False,
        closure_epsilon=0.0,
    )
    index = MstgIndex.build(data, cfg, seed=4, scan_dtype="fused8")
    assert not index._has_replicas()
    assert index.replication_factor() == 1.0
    params = MstgSearchParams(top_k=10, ef_search=6, pruning_epsilon=0.6)
    hits = index.batch_search(data[:10], params)
    for qi, row in enumerate(hits):
        ids = [h.id for h in row]
        assert qi in ids
        assert len(set(ids)) == len(ids)
    # forcing the dedup path must give the same results
    index._has_repl = (id(index._ids), True)
    hits2 = index.batch_search(data[:10], params)
    for a, b in zip(hits, hits2):
        assert [h.id for h in a] == [h.id for h in b]


def test_replicated_index_keeps_dedup(rng):
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    data = rng.standard_normal((1200, 48)).astype(np.float32)
    cfg = MstgConfig(
        max_posting_size=96, rabitq_bits=7, use_rotator=False,
        closure_epsilon=0.35,
    )
    index = MstgIndex.build(data, cfg, seed=4, scan_dtype="fused8")
    if not index._has_replicas():
        import pytest

        pytest.skip("closure produced no replicas on this draw")
    params = MstgSearchParams(top_k=10, ef_search=8, pruning_epsilon=0.6)
    for qi, row in enumerate(index.batch_search(data[:10], params)):
        ids = [h.id for h in row]
        assert len(set(ids)) == len(ids), "dedup must hold with replicas"
        assert qi in ids
