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
