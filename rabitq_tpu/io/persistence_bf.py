"""RBF1 v1 brute-force index persistence — byte-compatible with the
reference (lqhl/rabitq-rs ``brute_force.rs:298-523``).

Layout, little-endian:

    b"RBF1", u32 version = 1                  (not hashed)
    u32 dim, u32 padded_dim
    u8 metric, u8 rotator, u8 ex_bits, u8 total_bits
    u64 vector_count
    u64 rotator_len, rotator bytes
    per vector:
      binary_code_packed  ceil(padded_dim/8) bytes (MSB-first)
      ex_code_packed      ceil(padded_dim*ex_bits/8) bytes (cpp-compat)
      f32 x 8: delta, vl, f_add, f_rescale, f_error, residual_norm,
               f_add_ex, f_rescale_ex
    u32 crc32 of all hashed fields            (not hashed)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..errors import InvalidConfig, InvalidPersistence
from ..types import Metric, RotatorType
from ..ops import packing
from ..ops.rotation import deserialize_rotator

MAGIC = b"RBF1"
VERSION = 1


def save_brute_force(index, path) -> None:
    from ..index.brute_force import BruteForceRabitqIndex

    assert isinstance(index, BruteForceRabitqIndex)
    h = index.host
    n = len(index)
    padded_dim = index.padded_dim
    ex_bits = index.ex_bits

    binary_packed = packing.pack_binary(h.binary_bits)  # [n, ceil(pd/8)]
    if ex_bits > 0:
        ex_packed = packing.pack_ex(h.ex_codes, ex_bits)
        expected = (padded_dim * ex_bits + 7) // 8
        if ex_packed.shape[-1] != expected:
            raise InvalidConfig(
                "ex-code packed length does not match the RBF1 layout"
            )
    else:
        ex_packed = np.zeros((n, 0), np.uint8)

    meta = np.stack(
        [h.delta, h.vl, h.f_add, h.f_rescale, h.f_error, h.residual_norm,
         h.f_add_ex, h.f_rescale_ex],
        axis=1,
    ).astype("<f4")

    # one interleaved per-vector block, assembled vectorized
    per_vec = np.concatenate(
        [binary_packed, ex_packed, meta.view(np.uint8)], axis=1
    )

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
        rot = index.rotator.serialize()
        w(struct.pack("<Q", len(rot)))
        w(rot)
        w(per_vec.tobytes())
        w(struct.pack("<I", crc), hashed=False)


def load_brute_force(path, scan_dtype: str = "bf16"):
    from ..index.brute_force import BruteForceHost, BruteForceRabitqIndex
    from .persistence import _Cursor

    with open(path, "rb") as f:
        data = f.read()
    cur = _Cursor(data)
    if cur.take(4) != MAGIC:
        raise InvalidPersistence("unrecognized file header")
    if cur.u32() != VERSION:
        raise InvalidPersistence("unsupported index format version")
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
    ex_bits = cur.u8()
    if ex_bits > 16:
        raise InvalidPersistence("ex_bits out of range")
    total_bits = cur.u8()
    if total_bits == 0 or total_bits > 16 or total_bits - 1 != ex_bits:
        raise InvalidPersistence("total_bits does not match ex_bits")
    n = cur.u64()
    rot_len = cur.u64()
    rotator = deserialize_rotator(dim, padded_dim, RotatorType(rot_tag), cur.take(rot_len))

    bin_len = (padded_dim + 7) // 8
    ex_len = (padded_dim * ex_bits + 7) // 8 if ex_bits > 0 else 0
    row_len = bin_len + ex_len + 32
    block = cur.bytes_np(n * row_len).reshape(n, row_len) if n else np.zeros(
        (0, row_len), np.uint8
    )
    binary_bits = packing.unpack_binary(
        np.ascontiguousarray(block[:, :bin_len]), padded_dim
    )
    if ex_bits > 0:
        ex_codes = packing.unpack_ex(
            np.ascontiguousarray(block[:, bin_len : bin_len + ex_len]),
            padded_dim,
            ex_bits,
        )
    else:
        ex_codes = np.zeros((n, padded_dim), np.uint16)
    meta = np.ascontiguousarray(block[:, bin_len + ex_len :]).view("<f4")
    host = BruteForceHost(
        binary_bits=binary_bits.astype(np.uint8),
        ex_codes=ex_codes.astype(np.uint16),
        delta=meta[:, 0].astype(np.float32),
        vl=meta[:, 1].astype(np.float32),
        f_add=meta[:, 2].astype(np.float32),
        f_rescale=meta[:, 3].astype(np.float32),
        f_error=meta[:, 4].astype(np.float32),
        residual_norm=meta[:, 5].astype(np.float32),
        f_add_ex=meta[:, 6].astype(np.float32),
        f_rescale_ex=meta[:, 7].astype(np.float32),
    )
    return BruteForceRabitqIndex(
        dim, padded_dim, metric, rotator, ex_bits, host, scan_dtype=scan_dtype
    )
