"""K-means tests: convergence on separated clusters and seed determinism
(kmeans.rs:695-781)."""

import numpy as np

from rabitq_tpu.ops.kmeans import assign_dataset, run_kmeans


def _separated_clusters(rng, k=4, per=50, dim=16, spread=0.05):
    centers = rng.standard_normal((k, dim)).astype(np.float32) * 5.0
    data = np.concatenate(
        [c + spread * rng.standard_normal((per, dim)).astype(np.float32) for c in centers]
    )
    labels = np.repeat(np.arange(k), per)
    return data, labels, centers


def test_convergence_on_separated_clusters(rng):
    data, labels, _ = _separated_clusters(rng)
    res = run_kmeans(data, 4, niter=20, seed=1)
    # every found cluster should be pure
    for c in range(4):
        members = labels[res.assignments == c]
        assert members.size > 0
        assert np.all(members == members[0])


def test_determinism(rng):
    data = rng.standard_normal((300, 24)).astype(np.float32)
    r1 = run_kmeans(data, 8, niter=10, seed=77)
    r2 = run_kmeans(data, 8, niter=10, seed=77)
    np.testing.assert_array_equal(r1.assignments, r2.assignments)
    np.testing.assert_array_equal(r1.centroids, r2.centroids)


def test_objective_decreases_with_more_iters(rng):
    data = rng.standard_normal((500, 16)).astype(np.float32)
    short = run_kmeans(data, 16, niter=2, seed=5)
    long = run_kmeans(data, 16, niter=25, seed=5)
    assert long.objective <= short.objective * 1.001


def test_no_empty_clusters(rng):
    data, _, _ = _separated_clusters(rng, k=2, per=100)
    res = run_kmeans(data, 16, niter=15, seed=3)  # k >> natural clusters
    counts = np.bincount(res.assignments, minlength=16)
    assert np.all(counts > 0), counts


def test_assign_dataset_consistency(rng):
    data = rng.standard_normal((200, 8)).astype(np.float32)
    res = run_kmeans(data, 4, niter=10, seed=9)
    assign, obj = assign_dataset(data, res.centroids)
    np.testing.assert_array_equal(assign, res.assignments)
    assert np.isclose(obj, res.objective)


def test_early_stop_on_converged_clusters(rng):
    """tol > 0: separated blobs converge in a couple of iterations; the
    objective early stop must cut the loop short without changing the
    partition, and report the iteration count."""
    data, labels, _ = _separated_clusters(rng)
    full = run_kmeans(data, 4, niter=25, seed=1, with_report=True)
    early = run_kmeans(data, 4, niter=25, seed=1, tol=1e-4, with_report=True)
    assert full.iters == 25
    assert early.iters < 25, early.iters
    # same partition up to label permutation: compare co-membership
    np.testing.assert_array_equal(
        early.assignments == early.assignments[0],
        full.assignments == full.assignments[0],
    )
    assert early.objective <= full.objective * 1.01
    assert set(early.report) >= {"init_s", "lloyd_s", "assign_s"}


def test_bf16_assignment_matches_partition(rng):
    """bf16 MXU operands perturb distances ~2^-9 relatively; on separated
    clusters the partition must be identical to f32."""
    data, labels, _ = _separated_clusters(rng)
    f32 = run_kmeans(data, 4, niter=10, seed=2)
    bf16 = run_kmeans(data, 4, niter=10, seed=2, assign_dtype="bf16")
    for c in range(4):
        members = labels[bf16.assignments == c]
        assert members.size > 0 and np.all(members == members[0])
    # the reported bf16 objective itself carries |x||c|*2^-9 absolute dot
    # noise (meaningless on tight blobs); judge the PARTITION by its f32
    # objective instead
    _, obj_f32 = assign_dataset(data, bf16.centroids)
    assert abs(obj_f32 - f32.objective) / f32.objective < 0.02


def test_init_subsample_engages_and_quality_holds(rng):
    """Above the 64-rows-per-centroid cap the k-means++ init runs on a
    prefix subsample; clustering quality must hold."""
    from rabitq_tpu.ops.kmeans import _init_rows_cap

    assert _init_rows_cap(4096, 1_000_000) == 262_144
    assert _init_rows_cap(4, 300) == 300  # tiny runs keep every row
    # a k where the cap binds on CPU-sized data: k=8, n=66000 -> cap 65536
    data, labels, _ = _separated_clusters(rng, k=4, per=17_000, dim=8)
    res = run_kmeans(data, 8, niter=8, seed=3)
    counts = np.bincount(res.assignments, minlength=8)
    assert np.all(counts > 0)
    # every natural blob is recovered (possibly split across 2 of the 8)
    for lab in range(4):
        found = set(res.assignments[labels == lab])
        for c in found:
            members = labels[res.assignments == c]
            assert np.all(members == lab)
