"""Reader for the reference's multi-file MSTG persistence format.

The reference persists MSTG as ``{base}.mstg`` (magic ``MSTG`` version 1,
bincode bodies, CRC32) plus ``{base}.hnsw.graph``/``.hnsw.data`` dumps of
its hnsw_rs centroid graph (``mstg/io.rs:14-245``). This library's
navigation is an exact centroid matmul rebuilt from the posting-list
centroids — exactly what the reference's own loader does for the
quantized copies (``mstg/io.rs:238-243``) — so the hnsw files are
ignored; only the ``.mstg`` body is read.

bincode 1.3's legacy encoding (``bincode::serialize``): little-endian,
fixed-width integers (usize as u64), u64 sequence-length prefixes, u32
enum variant indices, 1-byte bools and Option tags. Struct field orders
follow ``mstg/config.rs:38-62``, ``mstg/posting_list.rs:6-32`` and
``quantizer.rs:60-88`` (``#[serde(skip)]`` fields absent).

This reader is one-way: the native single-file MSTG v1002 format remains
the write format (the reference cannot read v1002 either; the formats
are versioned apart and the smart loaders on both sides reject the
other's version tag rather than misparse it).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ...errors import InvalidPersistence
from ...types import Metric

_MAGIC = b"MSTG"
_REF_VERSION = 1


class _Bincode:
    """Cursor over bincode 1.3 legacy-encoded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise InvalidPersistence("unexpected end of bincode body")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def f32(self) -> float:
        return struct.unpack("<f", self.take(4))[0]

    def boolean(self) -> bool:
        v = self.u8()
        if v > 1:
            raise InvalidPersistence("invalid bincode bool")
        return bool(v)

    def enum_tag(self, n_variants: int) -> int:
        v = self.u32()
        if v >= n_variants:
            raise InvalidPersistence("invalid bincode enum variant")
        return v

    def option_f32(self) -> float | None:
        return self.f32() if self.boolean() else None

    def vec_u8(self) -> np.ndarray:
        n = self.u64()
        return np.frombuffer(self.take(n), np.uint8)

    def vec_u16(self) -> np.ndarray:
        n = self.u64()
        return np.frombuffer(self.take(2 * n), "<u2")

    def vec_f32(self) -> np.ndarray:
        n = self.u64()
        return np.frombuffer(self.take(4 * n), "<f4").astype(np.float32)

    @property
    def exhausted(self) -> bool:
        return self.pos == len(self.data)


def _parse_config(body: bytes):
    """MstgConfig field order (mstg/config.rs:38-62)."""
    from .config import MstgConfig, ScalarPrecision

    cur = _Bincode(body)
    cfg = MstgConfig(
        max_posting_size=cur.u64(),
        branching_factor=cur.u64(),
        balance_weight=cur.f32(),
        closure_epsilon=cur.f32(),
        max_replicas=cur.u64(),
        rabitq_bits=cur.u64(),
        faster_config=cur.boolean(),
        metric=Metric.from_tag(cur.enum_tag(2)),
        hnsw_m=cur.u64(),
        hnsw_ef_construction=cur.u64(),
        centroid_precision=list(ScalarPrecision)[cur.enum_tag(4)],
        default_ef_search=cur.u64(),
        pruning_epsilon=cur.f32(),
        # reference MSTG has neither survivor refinement nor a rotator
        refine_ex=False,
        use_rotator=False,
    )
    if not cur.exhausted:
        raise InvalidPersistence("trailing bytes in MSTG config body")
    return cfg


def _parse_posting_list(body: bytes, rabitq_bits: int):
    """PostingList (mstg/posting_list.rs:6-32) without #[serde(skip)] fields.

    Binary/ex codes are recovered from each vector's total-code array
    (``code = ex | binary << ex_bits``, quantizer.rs:165-168) — no need to
    re-derive them from the packed byte forms also present in the body.
    """
    cur = _Bincode(body)
    cluster_id = cur.u32()
    centroid = cur.vec_f32()
    size = cur.u32()
    # RabitqConfig { total_bits: u64, t_const: Option<f32> } (quantizer.rs:15)
    total_bits = cur.u64()
    cur.option_f32()
    if total_bits != rabitq_bits:
        raise InvalidPersistence("posting list bits disagree with config")
    n = cur.u64()
    if n != size:
        raise InvalidPersistence("posting list size mismatch")
    ex_bits = total_bits - 1
    dim = centroid.shape[0]
    ids = np.empty(n, np.int64)
    codes = np.empty((n, dim), np.uint16)
    scalars = {k: np.empty(n, np.float32) for k in (
        "delta", "vl", "f_add", "f_rescale", "f_error",
        "residual_norm", "f_add_ex", "f_rescale_ex")}
    for i in range(n):
        ids[i] = cur.u64()  # QuantizedVectorWithId.vector_id
        # QuantizedVector (quantizer.rs:63-88)
        code = cur.vec_u16()
        if code.shape[0] != dim:
            raise InvalidPersistence("quantized vector dimension mismatch")
        cur.vec_u8()  # binary_code_packed (redundant with `code`)
        cur.vec_u8()  # ex_code_packed (redundant with `code`)
        if cur.u8() != ex_bits:
            raise InvalidPersistence("vector ex_bits disagree with config")
        if cur.u64() != dim:
            raise InvalidPersistence("vector dim disagrees with centroid")
        codes[i] = code
        for k in scalars:
            scalars[k][i] = cur.f32()
    if not cur.exhausted:
        raise InvalidPersistence("trailing bytes in posting list body")
    return cluster_id, centroid, ids, codes, scalars


def load_reference_mstg(path, scan_dtype: str = "bf16"):
    """Load a reference-written ``.mstg`` file (or its base path)."""
    from .index import MstgHost, MstgIndex

    path = str(path)
    if not path.endswith(".mstg"):
        path = path + ".mstg"
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise InvalidPersistence("unrecognized file header")
    version = struct.unpack("<I", data[4:8])[0]
    if version != _REF_VERSION:
        raise InvalidPersistence(
            f"not a reference MSTG v1 file (version {version})"
        )
    if len(data) < 12:
        raise InvalidPersistence("file truncated")
    stored_crc = struct.unpack("<I", data[-4:])[0]
    # every field between the version and the checksum is hashed in order
    if zlib.crc32(data[8:-4]) != stored_crc:
        raise InvalidPersistence("checksum mismatch")

    cur = _Bincode(data[8:-4])
    cfg = _parse_config(cur.take(cur.u64()))
    n_centroid_ids = cur.u64()
    centroid_ids = [cur.u32() for _ in range(n_centroid_ids)]
    n_lists = cur.u64()
    lists = [
        _parse_posting_list(cur.take(cur.u64()), cfg.rabitq_bits)
        for _ in range(n_lists)
    ]
    if not cur.exhausted:
        raise InvalidPersistence("trailing bytes after posting lists")
    if centroid_ids and len(centroid_ids) != n_lists:
        raise InvalidPersistence("centroid id count mismatch")

    if not lists:
        raise InvalidPersistence("empty MSTG index")
    dim = lists[0][1].shape[0]
    ex_bits = cfg.rabitq_bits - 1
    mask = (1 << ex_bits) - 1
    offsets = np.zeros(n_lists + 1, np.int64)
    for i, (_, _, ids, _, _) in enumerate(lists):
        offsets[i + 1] = offsets[i] + ids.shape[0]
    total = int(offsets[-1])

    def cat2(idx):
        return (
            np.concatenate([l[idx] for l in lists])
            if total
            else np.zeros((0, dim))
        )

    codes = np.concatenate([l[3] for l in lists]).astype(np.uint16)
    host = MstgHost(
        binary_bits=(codes >> ex_bits).astype(np.uint8),
        ex_codes=(codes & mask).astype(np.uint16),
        f_add=np.concatenate([l[4]["f_add"] for l in lists]),
        f_rescale=np.concatenate([l[4]["f_rescale"] for l in lists]),
        f_add_ex=np.concatenate([l[4]["f_add_ex"] for l in lists]),
        f_rescale_ex=np.concatenate([l[4]["f_rescale_ex"] for l in lists]),
        delta=np.concatenate([l[4]["delta"] for l in lists]),
        vl=np.concatenate([l[4]["vl"] for l in lists]),
        ids=np.concatenate([l[2] for l in lists]),
        list_offsets=offsets,
        centroids=np.stack([l[1] for l in lists]),
    )
    return MstgIndex(cfg, dim, host, scan_dtype=scan_dtype)
