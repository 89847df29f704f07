"""RBQ1 v3 index persistence — byte-compatible with the reference.

Format (lqhl/rabitq-rs ``ivf.rs:1310-1702``), all little-endian:

    b"RBQ1"                       magic        (not hashed)
    u32  version = 3                           (not hashed)
    u32  dim
    u32  padded_dim
    u8   metric tag (0 = L2, 1 = IP)
    u8   rotator tag (0 = Matrix, 1 = FhtKac)
    u8   ex_bits
    u8   total_bits (= ex_bits + 1)
    u64  vector_count
    u64  cluster_count
    u64  rotator_len, rotator bytes
    per cluster:
      f32[padded_dim]  centroid (rotated space)
      u64              num_vectors
      u64[num]         ids
      u64              batch_data_len, batch_data bytes
      per vector: u64 ex_code_len + ex bytes (cpp-compat packing)
      f32[num] f_add_ex;  f32[num] f_rescale_ex
      f32[num] delta;     f32[num] vl
    u32  crc32 over every hashed field         (not hashed)

``batch_data`` is the FastScan layout, per 32-vector batch:
[KPERM0-transposed binary codes (padded_dim*32/8 B)][f_add f32*32]
[f_rescale f32*32][f_error f32*32] (``ivf.rs:216-242, 409-522``).

The CRC is crc32fast's IEEE CRC-32 == ``zlib.crc32``. Because every field
between the version and the trailing checksum is hashed in write order, the
digest is simply crc32(file[8:-4]).

The reference's save path emits stray debug prints (``ivf.rs:1370-1383``);
per SURVEY.md section 3.5 that behavior is deliberately not replicated.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..errors import InvalidConfig, InvalidPersistence
from ..types import Metric, RotatorType
from ..ops import packing
from ..ops.rotation import deserialize_rotator

MAGIC = b"RBQ1"
VERSION = 3
MAX_CLUSTER_SIZE = 1_000_000  # ivf.rs:1567


def save_ivf(index, path) -> None:
    from ..index.ivf import IvfRabitqIndex  # local import to avoid cycle

    assert isinstance(index, IvfRabitqIndex)
    h = index.host
    padded_dim = index.padded_dim
    if padded_dim % 8 != 0:
        raise InvalidConfig(
            "RBQ1 persistence requires padded_dim to be a multiple of 8"
        )
    dim_bytes = padded_dim // 8
    ex_bits = index.ex_bits
    n_clusters = h.cluster_offsets.shape[0] - 1
    n = h.binary_bits.shape[0]
    expected_ex_len = padded_dim * ex_bits // 8 if ex_bits > 0 else 0

    with open(path, "wb") as f:
        crc = 0

        def w(data: bytes, hashed: bool = True):
            nonlocal crc
            f.write(data)
            if hashed:
                crc = zlib.crc32(data, crc)

        w(MAGIC, hashed=False)
        w(struct.pack("<I", VERSION), hashed=False)
        w(struct.pack("<I", index.dim))
        w(struct.pack("<I", padded_dim))
        w(struct.pack("<B", index.metric.to_tag()))
        w(struct.pack("<B", int(index.rotator.rotator_type)))
        w(struct.pack("<B", ex_bits))
        w(struct.pack("<B", ex_bits + 1))
        w(struct.pack("<Q", n))
        w(struct.pack("<Q", n_clusters))
        rot = index.rotator.serialize()
        w(struct.pack("<Q", len(rot)))
        w(rot)

        for c in range(n_clusters):
            s, e = int(h.cluster_offsets[c]), int(h.cluster_offsets[c + 1])
            m = e - s
            w(np.ascontiguousarray(h.centroids[c], "<f4").tobytes())
            w(struct.pack("<Q", m))
            w(h.ids[s:e].astype("<u8").tobytes())

            batch = _build_batch_data(
                h.binary_bits[s:e],
                h.f_add[s:e],
                h.f_rescale[s:e],
                h.f_error[s:e],
                padded_dim,
            )
            w(struct.pack("<Q", len(batch)))
            w(batch)

            if ex_bits > 0:
                ex_packed = packing.pack_ex(h.ex_codes[s:e], ex_bits)
                if ex_packed.shape[-1] != expected_ex_len:
                    raise InvalidConfig(
                        "ex-code packed length does not match the RBQ1 layout "
                        f"({ex_packed.shape[-1]} != {expected_ex_len}); "
                        "this dim/ex_bits combination is not persistable"
                    )
                len_prefix = struct.pack("<Q", expected_ex_len)
                for r in range(m):
                    w(len_prefix)
                    w(ex_packed[r].tobytes())
            else:
                for _ in range(m):
                    w(struct.pack("<Q", 0))

            w(h.f_add_ex[s:e].astype("<f4").tobytes())
            w(h.f_rescale_ex[s:e].astype("<f4").tobytes())
            w(h.delta[s:e].astype("<f4").tobytes())
            w(h.vl[s:e].astype("<f4").tobytes())

        w(struct.pack("<I", crc), hashed=False)


def _build_batch_data(
    binary_bits: np.ndarray,  # [m, padded_dim] {0,1}
    f_add: np.ndarray,
    f_rescale: np.ndarray,
    f_error: np.ndarray,
    padded_dim: int,
) -> bytes:
    """FastScan batch layout for one cluster (``ivf.rs:409-522``)."""
    m = binary_bits.shape[0]
    bs = packing.FASTSCAN_BATCH_SIZE
    nb = (m + bs - 1) // bs
    dim_bytes = padded_dim // 8
    if nb == 0:
        return b""
    rows = np.zeros((nb * bs, padded_dim), np.uint8)
    rows[:m] = binary_bits
    packed_rows = packing.pack_binary(rows).reshape(nb, bs, dim_bytes)
    codes = packing.pack_codes(packed_rows)  # [nb, dim_bytes*32]

    def padf(x):
        out = np.zeros(nb * bs, np.float32)
        out[:m] = x
        return out.reshape(nb, bs).astype("<f4")

    parts = [
        codes.view(np.uint8),
        padf(f_add).view(np.uint8),
        padf(f_rescale).view(np.uint8),
        padf(f_error).view(np.uint8),
    ]
    return np.concatenate(parts, axis=1).tobytes()


def _parse_batch_data(
    blob: np.ndarray, m: int, padded_dim: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`_build_batch_data`; returns
    (binary_bits [m, padded_dim], f_add [m], f_rescale [m], f_error [m])."""
    bs = packing.FASTSCAN_BATCH_SIZE
    dim_bytes = padded_dim // 8
    stride = dim_bytes * bs + 4 * bs * 3
    nb = blob.shape[0] // stride if stride else 0
    if nb == 0:
        z = np.zeros((0, padded_dim), np.uint8)
        f = np.zeros(0, np.float32)
        return z, f, f.copy(), f.copy()
    rows = blob.reshape(nb, stride)
    codes = rows[:, : dim_bytes * bs]
    packed_rows = packing.unpack_codes(codes, dim_bytes)  # [nb, 32, dim_bytes]
    bits = packing.unpack_binary(
        packed_rows.reshape(nb * bs, dim_bytes), padded_dim
    )[:m]
    fpart = rows[:, dim_bytes * bs :].copy().view("<f4").reshape(nb, 3, bs)
    f_add = fpart[:, 0, :].reshape(-1)[:m].astype(np.float32)
    f_rescale = fpart[:, 1, :].reshape(-1)[:m].astype(np.float32)
    f_error = fpart[:, 2, :].reshape(-1)[:m].astype(np.float32)
    return bits, f_add, f_rescale, f_error


class _Cursor:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise InvalidPersistence("unexpected end of file")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def f32s(self, count: int) -> np.ndarray:
        return np.frombuffer(self.take(4 * count), "<f4").astype(np.float32)

    def u64s(self, count: int) -> np.ndarray:
        return np.frombuffer(self.take(8 * count), "<u8").copy()

    def bytes_np(self, count: int) -> np.ndarray:
        return np.frombuffer(self.take(count), np.uint8)


def load_ivf(path, scan_dtype: str = "bf16"):
    """Load an RBQ1 v3 index (``ivf.rs:1477-1702``) and convert to device
    code planes."""
    from ..index.ivf import HostCodes, IvfRabitqIndex

    with open(path, "rb") as f:
        data = f.read()
    cur = _Cursor(data)
    if cur.take(4) != MAGIC:
        raise InvalidPersistence("unrecognized file header")
    if cur.u32() != VERSION:
        raise InvalidPersistence(
            "unsupported index format version (expected V3 with unified memory layout)"
        )
    if len(data) < 12:
        raise InvalidPersistence("file truncated")
    stored_crc = struct.unpack("<I", data[-4:])[0]
    if zlib.crc32(data[8:-4]) != stored_crc:
        raise InvalidPersistence("checksum mismatch")

    dim = cur.u32()
    if dim == 0:
        raise InvalidPersistence("dimension must be positive")
    padded_dim = cur.u32()
    if padded_dim < dim:
        raise InvalidPersistence("padded_dim must be >= dim")
    metric = Metric.from_tag(cur.u8())
    rot_tag = cur.u8()
    if rot_tag not in (0, 1):
        raise InvalidPersistence("unknown rotator type tag")
    rotator_type = RotatorType(rot_tag)
    ex_bits = cur.u8()
    if ex_bits > 16:
        raise InvalidPersistence("ex_bits out of range")
    total_bits = cur.u8()
    if total_bits == 0 or total_bits > 16:
        raise InvalidPersistence("total_bits out of range")
    if total_bits - 1 != ex_bits:
        raise InvalidPersistence("total_bits does not match ex_bits")
    expected_vectors = cur.u64()
    cluster_count = cur.u64()
    rotator_len = cur.u64()
    rotator = deserialize_rotator(dim, padded_dim, rotator_type, cur.take(rotator_len))

    bs = packing.FASTSCAN_BATCH_SIZE
    dim_bytes_total = padded_dim * bs // 8
    expected_ex_len = padded_dim * ex_bits // 8 if ex_bits > 0 else 0

    centroids = np.empty((cluster_count, padded_dim), np.float32)
    offsets = np.zeros(cluster_count + 1, np.int64)
    chunks = {
        k: []
        for k in (
            "bits",
            "ex",
            "ids",
            "f_add",
            "f_rescale",
            "f_error",
            "f_add_ex",
            "f_rescale_ex",
            "delta",
            "vl",
        )
    }
    for c in range(cluster_count):
        centroids[c] = cur.f32s(padded_dim)
        m = cur.u64()
        if m > MAX_CLUSTER_SIZE:
            raise InvalidPersistence(
                "cluster size exceeds reasonable limits - possible corruption"
            )
        offsets[c + 1] = offsets[c] + m
        chunks["ids"].append(cur.u64s(m).astype(np.int64))
        batch_len = cur.u64()
        nb = (m + bs - 1) // bs
        expected_batch_len = nb * (dim_bytes_total + 4 * bs * 3)
        if batch_len != expected_batch_len:
            raise InvalidPersistence(
                "batch_data length mismatch - possible corruption or version incompatibility"
            )
        bits, f_add, f_rescale, f_error = _parse_batch_data(
            cur.bytes_np(batch_len), m, padded_dim
        )
        chunks["bits"].append(bits)
        chunks["f_add"].append(f_add)
        chunks["f_rescale"].append(f_rescale)
        chunks["f_error"].append(f_error)

        if m > 0:
            ex_block = cur.bytes_np(m * (8 + expected_ex_len)).reshape(
                m, 8 + expected_ex_len
            )
            lens = ex_block[:, :8].copy().view("<u8")[:, 0]
            if not np.all(lens == expected_ex_len):
                raise InvalidPersistence(
                    "ex_code_packed length mismatch - possible corruption or "
                    "version incompatibility"
                )
            ex_packed = np.ascontiguousarray(ex_block[:, 8:])
        else:
            ex_packed = np.zeros((0, expected_ex_len), np.uint8)
        chunks["ex"].append(packing.unpack_ex(ex_packed, padded_dim, ex_bits))
        chunks["f_add_ex"].append(cur.f32s(m))
        chunks["f_rescale_ex"].append(cur.f32s(m))
        chunks["delta"].append(cur.f32s(m))
        chunks["vl"].append(cur.f32s(m))

    n = int(offsets[-1])
    if n != expected_vectors:
        raise InvalidPersistence("vector count metadata mismatch")

    def cat(name, dtype, width=None):
        parts = chunks[name]
        if width is None:
            return (
                np.concatenate(parts).astype(dtype)
                if parts
                else np.zeros(0, dtype)
            )
        return (
            np.concatenate(parts).astype(dtype).reshape(n, width)
            if parts
            else np.zeros((0, width), dtype)
        )

    host = HostCodes(
        binary_bits=cat("bits", np.uint8, padded_dim),
        ex_codes=cat("ex", np.uint16, padded_dim),
        f_add=cat("f_add", np.float32),
        f_rescale=cat("f_rescale", np.float32),
        f_error=cat("f_error", np.float32),
        f_add_ex=cat("f_add_ex", np.float32),
        f_rescale_ex=cat("f_rescale_ex", np.float32),
        delta=cat("delta", np.float32),
        vl=cat("vl", np.float32),
        ids=cat("ids", np.int64),
        cluster_offsets=offsets,
        centroids=centroids,
    )
    return IvfRabitqIndex(
        dim, padded_dim, metric, rotator, ex_bits, host, scan_dtype=scan_dtype
    )
