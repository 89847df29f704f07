"""Independently-derived byte-format anchors for RBQ1 v3 and RBF1 v1.

Round 1's golden fixtures were written by this library itself, so a
misreading of the reference's layout shared by writer and reader would
pass every test. These fixtures are assembled byte-by-byte IN THIS FILE
with a second, scalar transcription of the reference's layouts —
field order from ``ivf.rs:1317-1474`` / ``brute_force.rs:305-385``,
binary packing from ``simd.rs:141-150`` (MSB-first), the FastScan KPERM0
transpose from ``simd.rs:864-904``, the 2-bit ex interleave from
``simd.rs:2478-2541`` and the 6-bit split interleave from
``simd.rs:2601-2695``. ``load_ivf``/``load_brute_force`` must parse them
and ``save_*`` must reproduce the bytes identically, converting
"self-certified" byte compatibility into two independent derivations
that agree.

Known reference quirk (documented in PARITY.md): for ex_bits == 0 the
reference BF *writer* dumps the quantizer's dim/16*2 zero-byte
allocation while its *loader* expects 0 bytes (``quantizer.rs:212`` vs
``brute_force.rs:464-468``) — its own 1-bit round trip never worked and
is untested there. This library follows the loader (0 bytes).
"""

import struct
import zlib

import numpy as np
import pytest

from rabitq_tpu import IvfRabitqIndex, BruteForceRabitqIndex, Metric
from rabitq_tpu.io.persistence import load_ivf, save_ivf
from rabitq_tpu.io.persistence_bf import load_brute_force, save_brute_force

# interop constant (the contract itself): simd.rs:774
KPERM0 = [0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7, 15]


# ---------------------------------------------------------------------------
# scalar packers, written from the layout documentation (NOT ops/packing.py)
# ---------------------------------------------------------------------------


def pack_binary_scalar(bits):
    """MSB-first: dimension 0 -> bit 7 of byte 0 (simd.rs:141-150)."""
    out = bytearray(len(bits) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i // 8] |= 1 << (7 - (i % 8))
    return bytes(out)


def pack_codes_scalar(packed_rows):
    """FastScan 32-vector transpose (simd.rs:864-904) for ONE batch.

    packed_rows: list of 32 equal-length byte strings (packed binary).
    Per byte column: split hi/lo nibble, emit 16+16 bytes via KPERM0.
    """
    assert len(packed_rows) == 32
    dim_bytes = len(packed_rows[0])
    out = bytearray()
    for col in range(dim_bytes):
        col_data = [packed_rows[v][col] for v in range(32)]
        hi = [c >> 4 for c in col_data]
        lo = [c & 15 for c in col_data]
        block = bytearray(32)
        for j in range(16):
            block[j] = hi[KPERM0[j]] | (hi[KPERM0[j] + 16] << 4)
            block[j + 16] = lo[KPERM0[j]] | (lo[KPERM0[j] + 16] << 4)
        out += block
    return bytes(out)


def pack_ex2_scalar(codes):
    """2-bit interleave (simd.rs:2478-2541): per 16 codes, 4 LE bytes of
    compact = (code3<<6)|(code2<<4)|(code1<<2)|code0 where codeK packs
    codes 4k..4k+3 into u32 byte lanes."""
    out = bytearray()
    for s in range(0, len(codes), 16):
        grp = [int(c) & 0x3 for c in codes[s : s + 16]]
        words = []
        for k in range(4):
            w = 0
            for b in range(4):
                w |= grp[4 * k + b] << (8 * b)
            words.append(w)
        compact = (words[3] << 6) | (words[2] << 4) | (words[1] << 2) | words[0]
        out += struct.pack("<I", compact & 0xFFFFFFFF)
    return bytes(out)


def pack_ex6_scalar(codes):
    """6-bit split interleave (simd.rs:2601-2695): per 16 codes, 8 LE bytes
    of low-4-bit nibble pairs then 4 LE bytes of the bit-4..5 planes."""
    MASK_4 = 0x0F0F0F0F0F0F0F0F
    MASK_2 = 0x30303030
    out = bytearray()
    for s in range(0, len(codes), 16):
        grp = [int(c) & 0x3F for c in codes[s : s + 16]]
        c40 = sum(grp[b] << (8 * b) for b in range(8))
        c41 = sum(grp[8 + b] << (8 * b) for b in range(8))
        compact4 = (((c41 & MASK_4) << 4) | (c40 & MASK_4)) & (2**64 - 1)
        out += struct.pack("<Q", compact4)
        w = [sum(grp[4 * k + b] << (8 * b) for b in range(4)) for k in range(4)]
        compact2 = (
            ((w[3] & MASK_2) << 2)
            | (w[2] & MASK_2)
            | ((w[1] & MASK_2) >> 2)
            | ((w[0] & MASK_2) >> 4)
        ) & 0xFFFFFFFF
        out += struct.pack("<I", compact2)
    return bytes(out)


def pack_ex_scalar(codes, ex_bits):
    if ex_bits == 2:
        return pack_ex2_scalar(codes)
    if ex_bits == 6:
        return pack_ex6_scalar(codes)
    raise NotImplementedError


def batch_data_scalar(bits_rows, f_add, f_rescale, f_error, padded_dim):
    """One cluster's batch_data: per 32-batch [KPERM0 codes][f_add][f_rescale]
    [f_error], ragged tail zero-padded incl. f_rescale=0 (ivf.rs:461-492)."""
    m = len(bits_rows)
    out = bytearray()
    for s in range(0, max(m, 1), 32):
        rows = list(bits_rows[s : s + 32])
        fa = list(f_add[s : s + 32])
        fr = list(f_rescale[s : s + 32])
        fe = list(f_error[s : s + 32])
        while len(rows) < 32:
            rows.append([0] * padded_dim)
            fa.append(0.0)
            fr.append(0.0)
            fe.append(0.0)
        packed_rows = [pack_binary_scalar(r) for r in rows]
        out += pack_codes_scalar(packed_rows)
        for arr in (fa, fr, fe):
            for v in arr:
                out += struct.pack("<f", np.float32(v))
    return bytes(out)


# ---------------------------------------------------------------------------
# fixture assembly
# ---------------------------------------------------------------------------

DIM = 64  # FhtKac padding keeps padded_dim == 64


def _micro_cluster_data(rng, sizes, ex_bits):
    """Deterministic micro index content: bits, codes, factors per cluster."""
    clusters = []
    next_id = 0
    for m in sizes:
        bits = rng.integers(0, 2, size=(m, DIM)).astype(int).tolist()
        ex = (
            rng.integers(0, (1 << ex_bits), size=(m, DIM)).astype(int).tolist()
            if ex_bits
            else [[0] * DIM for _ in range(m)]
        )
        mk = lambda lo, hi: [float(np.float32(x)) for x in rng.uniform(lo, hi, m)]
        clusters.append(
            dict(
                centroid=[float(np.float32(x)) for x in rng.standard_normal(DIM)],
                ids=list(range(next_id, next_id + m)),
                bits=bits,
                ex=ex,
                f_add=mk(0.5, 2.0),
                f_rescale=mk(-2.0, -0.5),
                f_error=mk(0.0, 0.3),
                f_add_ex=mk(0.5, 2.0),
                f_rescale_ex=mk(-1.0, -0.1),
                delta=mk(0.01, 0.1),
                vl=mk(-1.0, 0.0),
            )
        )
        next_id += m
    return clusters


def assemble_rbq1(clusters, ex_bits, metric_tag, flip):
    """Hand-assembled RBQ1 v3 bytes (field order: ivf.rs:1317-1474)."""
    body = bytearray()  # hashed region
    body += struct.pack("<I", DIM)
    body += struct.pack("<I", DIM)  # padded_dim
    body += bytes([metric_tag])
    body += bytes([1])  # FhtKacRotator tag (rotation.rs:14)
    body += bytes([ex_bits])
    body += bytes([ex_bits + 1])
    n = sum(len(c["ids"]) for c in clusters)
    body += struct.pack("<Q", n)
    body += struct.pack("<Q", len(clusters))
    body += struct.pack("<Q", len(flip))
    body += flip
    for c in clusters:
        for v in c["centroid"]:
            body += struct.pack("<f", np.float32(v))
        m = len(c["ids"])
        body += struct.pack("<Q", m)
        for i in c["ids"]:
            body += struct.pack("<Q", i)
        batch = batch_data_scalar(
            c["bits"], c["f_add"], c["f_rescale"], c["f_error"], DIM
        )
        body += struct.pack("<Q", len(batch))
        body += batch
        for r in range(m):
            if ex_bits > 0:
                blob = pack_ex_scalar(c["ex"][r], ex_bits)
                body += struct.pack("<Q", len(blob))
                body += blob
            else:
                body += struct.pack("<Q", 0)
        for name in ("f_add_ex", "f_rescale_ex", "delta", "vl"):
            for v in c[name]:
                body += struct.pack("<f", np.float32(v))
    out = b"RBQ1" + struct.pack("<I", 3) + bytes(body)
    return out + struct.pack("<I", zlib.crc32(bytes(body)))


def assemble_rbf1(cluster, ex_bits, metric_tag, flip):
    """Hand-assembled RBF1 v1 bytes (field order: brute_force.rs:305-385).
    Per vector: [binary packed][ex packed][delta vl f_add f_rescale f_error
    residual_norm f_add_ex f_rescale_ex]."""
    body = bytearray()
    body += struct.pack("<I", DIM)
    body += struct.pack("<I", DIM)
    body += bytes([metric_tag, 1, ex_bits, ex_bits + 1])
    m = len(cluster["ids"])
    body += struct.pack("<Q", m)
    body += struct.pack("<Q", len(flip))
    body += flip
    rn = cluster["residual_norm"]
    for r in range(m):
        body += pack_binary_scalar(cluster["bits"][r])
        if ex_bits > 0:
            body += pack_ex_scalar(cluster["ex"][r], ex_bits)
        for name in ("delta", "vl", "f_add", "f_rescale", "f_error"):
            body += struct.pack("<f", np.float32(cluster[name][r]))
        body += struct.pack("<f", np.float32(rn[r]))
        for name in ("f_add_ex", "f_rescale_ex"):
            body += struct.pack("<f", np.float32(cluster[name][r]))
    out = b"RBF1" + struct.pack("<I", 1) + bytes(body)
    return out + struct.pack("<I", zlib.crc32(bytes(body)))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("total_bits,metric", [(3, Metric.L2), (7, Metric.L2), (1, Metric.InnerProduct)])
def test_rbq1_hand_assembled_fixture(total_bits, metric, tmp_path):
    ex_bits = total_bits - 1
    rng = np.random.default_rng(100 + total_bits)
    flip = bytes(rng.integers(0, 256, size=4 * DIM // 8, dtype=np.uint8))
    clusters = _micro_cluster_data(rng, sizes=(3, 2), ex_bits=ex_bits)
    blob = assemble_rbq1(clusters, ex_bits, metric.to_tag(), flip)

    path = tmp_path / "hand.rbq"
    path.write_bytes(blob)
    index = load_ivf(path, scan_dtype="f32")

    assert index.dim == DIM and index.padded_dim == DIM
    assert index.metric is metric and index.ex_bits == ex_bits
    assert index.rotator.serialize() == flip
    h = index.host
    assert h.cluster_offsets.tolist() == [0, 3, 5]
    row = 0
    for c in clusters:
        m = len(c["ids"])
        assert h.ids[row : row + m].tolist() == c["ids"]
        np.testing.assert_array_equal(
            h.binary_bits[row : row + m], np.array(c["bits"], np.uint8)
        )
        np.testing.assert_array_equal(
            h.ex_codes[row : row + m], np.array(c["ex"], np.uint16)
        )
        for name in ("f_add", "f_rescale", "f_error", "f_add_ex",
                     "f_rescale_ex", "delta", "vl"):
            np.testing.assert_array_equal(
                getattr(h, name)[row : row + m], np.array(c[name], np.float32)
            )
        row += m

    # writer must reproduce the hand-assembled bytes exactly
    out = tmp_path / "rewrite.rbq"
    save_ivf(index, out)
    assert out.read_bytes() == blob


@pytest.mark.parametrize("total_bits,metric", [(3, Metric.InnerProduct), (7, Metric.L2)])
def test_rbf1_hand_assembled_fixture(total_bits, metric, tmp_path):
    ex_bits = total_bits - 1
    rng = np.random.default_rng(200 + total_bits)
    flip = bytes(rng.integers(0, 256, size=4 * DIM // 8, dtype=np.uint8))
    (cluster,) = _micro_cluster_data(rng, sizes=(5,), ex_bits=ex_bits)
    cluster["residual_norm"] = [
        float(np.float32(x)) for x in rng.uniform(0.1, 2.0, 5)
    ]
    blob = assemble_rbf1(cluster, ex_bits, metric.to_tag(), flip)

    path = tmp_path / "hand.rbf"
    path.write_bytes(blob)
    index = load_brute_force(path, scan_dtype="f32")
    assert index.dim == DIM and index.metric is metric and index.ex_bits == ex_bits
    assert index.rotator.serialize() == flip
    h = index.host
    np.testing.assert_array_equal(h.binary_bits, np.array(cluster["bits"], np.uint8))
    np.testing.assert_array_equal(h.ex_codes, np.array(cluster["ex"], np.uint16))
    for name in ("f_add", "f_rescale", "f_error", "f_add_ex", "f_rescale_ex",
                 "delta", "vl", "residual_norm"):
        np.testing.assert_array_equal(
            getattr(h, name), np.array(cluster[name], np.float32)
        )

    out = tmp_path / "rewrite.rbf"
    save_brute_force(index, out)
    assert out.read_bytes() == blob


def test_rbq1_crc_guard(tmp_path):
    rng = np.random.default_rng(7)
    flip = bytes(rng.integers(0, 256, size=4 * DIM // 8, dtype=np.uint8))
    clusters = _micro_cluster_data(rng, sizes=(2,), ex_bits=2)
    blob = bytearray(assemble_rbq1(clusters, 2, 0, flip))
    blob[40] ^= 0x01  # flip a bit inside the hashed region
    path = tmp_path / "corrupt.rbq"
    path.write_bytes(bytes(blob))
    with pytest.raises(Exception):
        load_ivf(path)


# ---------------------------------------------------------------------------
# reference MSTG bincode format (mstg/io.rs:14-245)
# ---------------------------------------------------------------------------


def _bincode_vec_f32(a):
    a = np.asarray(a, "<f4")
    return struct.pack("<Q", a.size) + a.tobytes()


def _bincode_vec_u16(a):
    a = np.asarray(a, "<u2")
    return struct.pack("<Q", a.size) + a.tobytes()


def _bincode_vec_u8(b):
    return struct.pack("<Q", len(b)) + bytes(b)


def _bincode_config(cfg_vals):
    """MstgConfig in bincode 1.3 legacy encoding (mstg/config.rs:38-62):
    usize->u64 LE, f32 LE, bool u8, enum u32 variant index."""
    (max_posting, branching, balance_w, closure_eps, max_replicas,
     bits, faster, metric_tag, hnsw_m, hnsw_efc, prec_tag, ef, prune_eps) = cfg_vals
    out = struct.pack("<QQ", max_posting, branching)
    out += struct.pack("<ff", balance_w, closure_eps)
    out += struct.pack("<QQ", max_replicas, bits)
    out += struct.pack("<B", 1 if faster else 0)
    out += struct.pack("<I", metric_tag)
    out += struct.pack("<QQ", hnsw_m, hnsw_efc)
    out += struct.pack("<I", prec_tag)
    out += struct.pack("<Q", ef)
    out += struct.pack("<f", prune_eps)
    return out


def _bincode_posting_list(cluster_id, centroid, ids, codes, scalars, ex_bits):
    """PostingList minus #[serde(skip)] fields (mstg/posting_list.rs:6-32)."""
    dim = len(centroid)
    out = struct.pack("<I", cluster_id)
    out += _bincode_vec_f32(centroid)
    out += struct.pack("<I", len(ids))
    # RabitqConfig { total_bits: u64, t_const: Option<f32> = None }
    out += struct.pack("<Q", ex_bits + 1) + b"\x00"
    out += struct.pack("<Q", len(ids))
    for r in range(len(ids)):
        out += struct.pack("<Q", int(ids[r]))  # QuantizedVectorWithId.vector_id
        total = codes[r]
        binary = (total >> ex_bits).astype(int).tolist()
        ex = (total & ((1 << ex_bits) - 1)).astype(int).tolist()
        out += _bincode_vec_u16(total)
        out += _bincode_vec_u8(pack_binary_scalar(binary))
        out += _bincode_vec_u8(pack_ex_scalar(ex, ex_bits) if ex_bits else b"")
        out += struct.pack("<B", ex_bits)
        out += struct.pack("<Q", dim)
        for name in ("delta", "vl", "f_add", "f_rescale", "f_error",
                     "residual_norm", "f_add_ex", "f_rescale_ex"):
            out += struct.pack("<f", np.float32(scalars[name][r]))
    return out


def test_reference_mstg_format_loads(tmp_path):
    """A reference-layout bincode .mstg file (assembled here independently)
    must load through MstgIndex.load_from_path and search identically to
    the index whose content it encodes (VERDICT item 3b)."""
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    rng = np.random.default_rng(11)
    data = rng.standard_normal((400, DIM)).astype(np.float32)
    built = MstgIndex.build(
        data,
        MstgConfig(max_posting_size=64, faster_config=True, refine_ex=False),
        seed=2,
        scan_dtype="f32",
    )
    h = built.host
    ex_bits = built.config.rabitq_bits - 1

    body = bytearray()
    cfg_bytes = _bincode_config(
        (64, 10, 1.0, 0.15, 8, built.config.rabitq_bits, True, 0, 32, 200, 1,
         150, 0.6)
    )
    body += struct.pack("<Q", len(cfg_bytes)) + cfg_bytes
    n_lists = built.posting_list_count()
    body += struct.pack("<Q", n_lists)
    for c in range(n_lists):
        body += struct.pack("<I", c)
    body += struct.pack("<Q", n_lists)
    zeros = np.zeros(built.total_rows, np.float32)
    for c in range(n_lists):
        s, e = int(h.list_offsets[c]), int(h.list_offsets[c + 1])
        total = (
            h.ex_codes[s:e].astype(np.uint16)
            | (h.binary_bits[s:e].astype(np.uint16) << ex_bits)
        )
        scalars = dict(
            delta=h.delta[s:e], vl=h.vl[s:e], f_add=h.f_add[s:e],
            f_rescale=h.f_rescale[s:e], f_error=zeros[s:e],
            residual_norm=zeros[s:e], f_add_ex=h.f_add_ex[s:e],
            f_rescale_ex=h.f_rescale_ex[s:e],
        )
        pl = _bincode_posting_list(
            c, h.centroids[c], h.ids[s:e], total, scalars, ex_bits
        )
        body += struct.pack("<Q", len(pl)) + pl
    blob = b"MSTG" + struct.pack("<I", 1) + bytes(body)
    blob += struct.pack("<I", zlib.crc32(bytes(body)))

    path = tmp_path / "ref_index.mstg"
    path.write_bytes(blob)

    from rabitq_tpu import MstgIndex as MI

    loaded = MI.load_from_path(path, scan_dtype="f32")
    assert loaded.config.rabitq_bits == built.config.rabitq_bits
    assert loaded.config.max_posting_size == 64
    assert loaded.config.metric is Metric.L2
    assert loaded.posting_list_count() == n_lists
    lh = loaded.host
    np.testing.assert_array_equal(lh.binary_bits, h.binary_bits)
    np.testing.assert_array_equal(lh.ex_codes, h.ex_codes)
    np.testing.assert_array_equal(lh.ids, h.ids)
    np.testing.assert_array_equal(lh.list_offsets, h.list_offsets)
    for name in ("f_add", "f_rescale", "f_add_ex", "f_rescale_ex", "delta", "vl"):
        np.testing.assert_array_equal(getattr(lh, name), getattr(h, name))
    np.testing.assert_allclose(lh.centroids, h.centroids, rtol=1e-6)

    params = MstgSearchParams(top_k=5, ef_search=16, pruning_epsilon=0.6)
    got = loaded.batch_search(data[:8], params)
    want = built.batch_search(data[:8], params)
    assert [[r.id for r in row] for row in got] == [
        [r.id for r in row] for row in want
    ]


def test_reference_mstg_corruption_detected(tmp_path):
    from rabitq_tpu import MstgIndex

    blob = bytearray(b"MSTG" + struct.pack("<I", 1))
    body = struct.pack("<Q", 4) + b"abcd" + struct.pack("<Q", 0) + struct.pack("<Q", 0)
    blob += body + struct.pack("<I", zlib.crc32(body) ^ 0xDEAD)
    path = tmp_path / "bad.mstg"
    path.write_bytes(bytes(blob))
    with pytest.raises(Exception):
        MstgIndex.load_from_path(path)
