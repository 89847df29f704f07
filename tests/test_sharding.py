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
