"""Binding-parity API and CLI tests (mirrors test_python_bindings.py of the
reference: MstgIndex fit/query/batch shapes, metric variants, IVF binding
presence)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from rabitq_tpu.bindings import IvfRabitqIndex, MstgIndex
from rabitq_tpu.io.vecio import read_fvecs, write_fvecs, write_ivecs


def _data(rng, n=400, dim=32):
    return rng.standard_normal((n, dim)).astype(np.float32)


def test_mstg_binding_fit_query_shapes(rng):
    data = _data(rng)
    index = MstgIndex(32, metric="euclidean", max_posting_size=100, branching_factor=4)
    index.fit(data)
    assert len(index) == 400
    res = index.query(data[0], k=5)
    assert res.shape == (5, 2) and res.dtype == np.float32
    assert int(res[0, 0]) == 0  # finds itself
    batch = index.batch_query(data[:3], k=5)
    assert len(batch) == 3 and all(b.shape == (5, 2) for b in batch)
    assert index.get_memory_usage() > 0


def test_mstg_binding_angular(rng):
    data = _data(rng)
    index = MstgIndex(32, metric="angular", max_posting_size=100, branching_factor=4)
    index.fit(data)
    res = index.query(data[1], k=3)
    assert res.shape == (3, 2)


def test_mstg_binding_set_query_arguments_and_errors(rng):
    index = MstgIndex(32)
    with pytest.raises(RuntimeError):
        index.query(np.zeros(32, np.float32), 5)
    with pytest.raises(ValueError):
        MstgIndex(32, metric="cosine")
    with pytest.raises(ValueError):
        MstgIndex(32, centroid_precision="fp64")
    index.set_query_arguments(ef_search=50, pruning_epsilon=0.3)
    assert index.config.default_ef_search == 50


def test_mstg_binding_save_load(tmp_path, rng):
    data = _data(rng)
    index = MstgIndex(32, max_posting_size=100, branching_factor=4)
    index.fit(data)
    p = str(tmp_path / "m.mstg")
    index.save(p)
    loaded = MstgIndex.load(p)
    assert len(loaded) == 400
    a = index.query(data[2], 5)
    b = loaded.query(data[2], 5)
    np.testing.assert_array_equal(a[:, 0], b[:, 0])


def test_ivf_binding_surface(tmp_path, rng):
    data = _data(rng)
    index = IvfRabitqIndex(32, metric="euclidean")
    with pytest.raises(RuntimeError):
        index.query(data[0], 5, 4)
    index.fit(data, nlist=8, total_bits=7, rotator_type="fht", seed=1)
    assert index.cluster_count() == 8 and len(index) == 400
    res = index.query(data[0], k=5, nprobe=8)
    assert res.shape == (5, 2) and int(res[0, 0]) == 0
    batch = index.batch_query(data[:4], k=5, nprobe=8)
    assert len(batch) == 4
    p = str(tmp_path / "i.rbq")
    index.save(p)
    other = IvfRabitqIndex(32)
    other.load(p)
    np.testing.assert_array_equal(
        other.query(data[0], 5, 8)[:, 0], res[:, 0]
    )


def test_ivf_binding_fit_with_clusters(rng):
    from rabitq_tpu.ops.kmeans import run_kmeans

    data = _data(rng)
    km = run_kmeans(data, 8, niter=10, seed=3)
    index = IvfRabitqIndex(32)
    index.fit_with_clusters(data, km.centroids, km.assignments, total_bits=5)
    assert len(index) == 400


def test_vecio_roundtrip(tmp_path, rng):
    data = _data(rng, 50, 16)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, data)
    back = read_fvecs(p)
    np.testing.assert_array_equal(back, data)
    back2 = read_fvecs(p, limit=10)
    assert back2.shape == (10, 16)


def _run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "rabitq_tpu", *args],
        capture_output=True,
        text=True,
        env={
            "PYTHONPATH": ".",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "JAX_PLATFORMS": "cpu",
            "HOME": "/root",
        },
        cwd="/root/repo",
    )


@pytest.mark.slow
def test_cli_build_query_info(tmp_path, rng):
    data = _data(rng, 300, 32)
    queries = data[:8]
    base = str(tmp_path / "base.fvecs")
    qf = str(tmp_path / "q.fvecs")
    gtf = str(tmp_path / "gt.ivecs")
    write_fvecs(base, data)
    write_fvecs(qf, queries)
    d2 = ((data[None, :, :] - queries[:, None, :]) ** 2).sum(-1)
    write_ivecs(gtf, np.argsort(d2, axis=1)[:, :10].astype(np.int32))
    ix = str(tmp_path / "index.rbq")

    r = _run_cli("build", "--data", base, "--output", ix, "--nlist", "8",
                 "--total-bits", "7")
    assert r.returncode == 0, r.stderr
    r = _run_cli("info", "--index", ix)
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout)
    assert info["kind"] == "ivf" and info["vectors"] == 300
    r = _run_cli("query", "--index", ix, "--queries", qf, "--k", "10",
                 "--nprobe", "8", "--groundtruth", gtf)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["recall"] >= 0.9, out


@pytest.mark.slow
def test_cli_sweep_writes_reference_csv_schema(tmp_path, rng):
    """`rabitq_tpu sweep` end-to-end on tiny data: the CSV carries the
    reference schema (examples/recall_qps_sweep.rs) and the recall
    columns — computed from the device-RESIDENT query cache — are sane
    for both engines."""
    data = _data(rng, 400, 32)
    queries = data[:8]
    base = str(tmp_path / "base.fvecs")
    qf = str(tmp_path / "q.fvecs")
    gtf = str(tmp_path / "gt.ivecs")
    write_fvecs(base, data)
    write_fvecs(qf, queries)
    d2 = ((data[None, :, :] - queries[:, None, :]) ** 2).sum(-1)
    write_ivecs(gtf, np.argsort(d2, axis=1)[:, :10].astype(np.int32))
    out_csv = str(tmp_path / "sweep.csv")
    r = _run_cli(
        "sweep", "--data", base, "--queries", qf, "--groundtruth", gtf,
        "--method", "both", "--nlist", "8", "--nprobes", "8",
        "--efs", "8", "--epsilons", "0.8", "--max-posting-size", "100",
        "--k", "10", "--stream-reps", "1", "--output", out_csv,
    )
    assert r.returncode == 0, r.stderr
    rows = open(out_csv).read().strip().splitlines()
    assert rows[0] == "method,config,recall_at_10,latency_ms,qps"
    assert len(rows) == 3 and rows[1].startswith("IVF,") and rows[2].startswith("MSTG,")
    for row in rows[1:]:
        rec = float(row.rsplit(",", 3)[1])
        assert rec >= 0.8, row


def test_binding_batch_query_large_batch_pipelined(rng):
    """batch_query > 256 queries takes the pipelined serving loop in both
    bindings and returns exactly the small-path results."""
    data = _data(rng, n=800)
    ivf = IvfRabitqIndex(32)
    ivf.fit(data, nlist=8)
    queries = np.concatenate([data, data])[:300]
    big = ivf.batch_query(queries, k=5, nprobe=8)
    small = [ivf.batch_query(queries[i : i + 1], k=5, nprobe=8)[0] for i in range(0, 300, 97)]
    assert len(big) == 300
    for i, ref in zip(range(0, 300, 97), small):
        np.testing.assert_array_equal(big[i][:, 0], ref[:, 0])
        np.testing.assert_allclose(big[i][:, 1], ref[:, 1], rtol=1e-5)

    mstg = MstgIndex(32, max_posting_size=100, branching_factor=4)
    mstg.fit(data)
    big_m = mstg.batch_query(queries, k=5)
    assert len(big_m) == 300
    one = mstg.batch_query(queries[:1], k=5)[0]
    np.testing.assert_array_equal(big_m[0][:, 0], one[:, 0])
