"""hnsw_rs side-file emission: builder quality, dump/parse round-trip,
and the reference-format save producing the complete three-file set
(``/root/reference/src/mstg/io.rs:76-112`` — save_to_path writes
``.mstg`` + ``.hnsw.graph`` + ``.hnsw.data``; load_from_path demands all
three)."""

import numpy as np
import pytest

from rabitq_tpu.index.mstg.hnsw_graph import (
    NB_LAYER_MAX,
    build_hnsw,
    search_hnsw,
)
from rabitq_tpu.index.mstg.hnswio import (
    DIST_L2_NAME,
    HnswDumpError,
    MAGICDATAP,
    MAGICDESCR,
    dump_hnsw,
    parse_hnsw_dump,
)


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((400, 24)).astype(np.float32)
    return vecs, build_hnsw(vecs, seed=11)


def test_builder_structure(small_graph):
    vecs, g = small_graph
    n = vecs.shape[0]
    assert g.levels.shape == (n,)
    assert int(g.levels[g.entry_point]) == int(g.levels.max())
    for p in range(n):
        assert len(g.neighbors[p]) == int(g.levels[p]) + 1
        for l, lst in enumerate(g.neighbors[p]):
            cap = 2 * g.m if l == 0 else g.m
            assert len(lst) <= cap
            assert p not in lst  # no self-links
            for q in lst:
                # links only to points that exist on that layer
                assert int(g.levels[q]) >= l


def test_builder_navigable(small_graph):
    """Greedy search on the graph must essentially solve exact NN on a
    400-point set — this is the property the reference's loaded-graph
    search depends on (mstg/hnsw.rs:120-160)."""
    vecs, g = small_graph
    rng = np.random.default_rng(5)
    queries = rng.standard_normal((32, vecs.shape[1])).astype(np.float32)
    d2 = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    exact = np.argsort(d2, axis=1)[:, :10]
    hits = 0
    for qi, q in enumerate(queries):
        ids, _ = search_hnsw(g, q, k=10, ef=64)
        hits += len(set(int(i) for i in ids) & set(int(i) for i in exact[qi]))
    assert hits / (32 * 10) >= 0.95


def test_dump_parse_roundtrip(tmp_path, small_graph):
    vecs, g = small_graph
    base = str(tmp_path / "centroids")
    gp, dp = dump_hnsw(base, g)
    assert gp.endswith(".hnsw.graph") and dp.endswith(".hnsw.data")

    parsed = parse_hnsw_dump(base)
    n = vecs.shape[0]
    assert parsed["nb_point"] == n
    assert parsed["dimension"] == vecs.shape[1]
    assert parsed["max_nb_connection"] == g.m
    assert parsed["nb_layer"] == NB_LAYER_MAX
    assert parsed["ef_construction"] == g.ef_construction
    assert parsed["distname"] == DIST_L2_NAME
    assert parsed["t_name"] == "f32"
    assert parsed["dumpmode"] == 1

    # every point present exactly once, with its vector byte-exact
    assert set(parsed["vectors"].keys()) == set(range(n))
    for p in range(0, n, 37):
        np.testing.assert_array_equal(parsed["vectors"][p], vecs[p])
        assert parsed["levels"][p] == int(g.levels[p])
        # neighbour layer lists match the in-memory graph
        nb = parsed["neighbors"][p]
        assert len(nb) == int(g.levels[p]) + 1
        for l, lst in enumerate(nb):
            assert [i for i, _ in lst] == g.neighbors[p][l]
            # distances are true Euclidean
            for i, dist in lst:
                ref = float(np.linalg.norm(vecs[p] - vecs[i]))
                assert dist == pytest.approx(ref, rel=1e-5)


def test_dump_detects_corruption(tmp_path, small_graph):
    vecs, g = small_graph
    base = str(tmp_path / "c")
    gp, dp = dump_hnsw(base, g)
    raw = bytearray(open(gp, "rb").read())
    raw[0] ^= 0xFF  # clobber the description magic
    open(gp, "wb").write(bytes(raw))
    with pytest.raises(HnswDumpError, match="description magic"):
        parse_hnsw_dump(base)


def test_magic_constants_layout(tmp_path, small_graph):
    """Spot-check raw bytes so a writer regression cannot silently change
    the header layout (analogous to tests/test_format_anchor.py)."""
    vecs, g = small_graph
    base = str(tmp_path / "anchor")
    gp, dp = dump_hnsw(base, g)
    graw = open(gp, "rb").read()
    draw = open(dp, "rb").read()
    assert graw[:4] == MAGICDESCR.to_bytes(4, "little")
    assert graw[4] == 1  # dumpmode Full
    assert graw[5] == 32  # max_nb_connection
    assert graw[6] == 16  # nb_layer
    assert int.from_bytes(graw[7:15], "little") == 200  # ef_construction
    assert int.from_bytes(graw[15:23], "little") == vecs.shape[0]
    assert int.from_bytes(graw[23:31], "little") == vecs.shape[1]
    namelen = int.from_bytes(graw[31:39], "little")
    assert graw[39 : 39 + namelen].decode() == DIST_L2_NAME
    assert draw[:4] == MAGICDATAP.to_bytes(4, "little")
    assert int.from_bytes(draw[4:12], "little") == vecs.shape[0]
    assert int.from_bytes(draw[12:20], "little") == vecs.shape[1]


def test_reference_save_emits_three_files(tmp_path):
    from rabitq_tpu import Metric
    from rabitq_tpu.index.mstg import MstgConfig, MstgIndex
    from rabitq_tpu.index.mstg.ref_io import load_reference_mstg

    rng = np.random.default_rng(9)
    data = rng.standard_normal((600, 32)).astype(np.float32)
    cfg = MstgConfig(
        max_posting_size=128, rabitq_bits=7, metric=Metric.L2,
        use_rotator=False,
    )
    index = MstgIndex.build(data, cfg, seed=4)
    base = str(tmp_path / "interop")
    index.save_to_path(base, format="reference")

    # the reference's load_from_path expects exactly these three
    for suffix in (".mstg", ".hnsw.graph", ".hnsw.data"):
        assert (tmp_path / f"interop{suffix}").exists(), suffix

    # the graph covers every posting-list centroid with its f32 vector
    parsed = parse_hnsw_dump(base)
    n_lists = index.posting_list_count()
    assert parsed["nb_point"] == n_lists
    cents = index.host.centroids
    for i in range(n_lists):
        np.testing.assert_array_equal(
            parsed["vectors"][i], cents[i].astype(np.float32)
        )

    # and the .mstg body still round-trips through the reader
    loaded = load_reference_mstg(base + ".mstg")
    assert loaded.posting_list_count() == n_lists
