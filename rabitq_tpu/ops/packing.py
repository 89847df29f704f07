"""Bit-packing codecs for the reference's persisted code formats.

These run host-side only (index save/load and format interop) — the device
keeps codes as dense int8 planes, which is the layout the MXU wants
(SURVEY.md section 2.4: "store codes as i8 planes instead of the CPU nibble
interleave; keep the reference's serialized format, converting at load").

Formats, byte-compatible with lqhl/rabitq-rs:

* binary codes: 1 bit/dim, MSB-first within each byte (``simd.rs:141-163``)
* generic ex-codes: LSB-first bitstream, ``ex_bits`` bits/dim
  (``simd.rs:166-223``)
* C++-compatible interleaved ex-code packings for ex_bits 1/2/6
  (``simd.rs:2406-2695``)
* FastScan 32-vector batch transpose with the KPERM0 permutation
  (``pack_codes``/``unpack_single_vector``, ``simd.rs:864-960``)

All codecs are vectorized numpy (no Python per-element loops) and each has
an exact inverse; tests round-trip them exhaustively.
"""

from __future__ import annotations

import numpy as np

from .. import native as _native

FASTSCAN_BATCH_SIZE = 32  # simd.rs:768
KPERM0 = np.array([0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7, 15])  # simd.rs:774


# ---------------------------------------------------------------------------
# binary codes (MSB-first)
# ---------------------------------------------------------------------------

def pack_binary(bits: np.ndarray) -> np.ndarray:
    """[..., D] {0,1} -> [..., ceil(D/8)] bytes, MSB-first (simd.rs:141-150)."""
    if _native.available():
        return _native.pack_binary(bits)
    return np.packbits(bits.astype(np.uint8), axis=-1, bitorder="big")


def unpack_binary(packed: np.ndarray, dim: int) -> np.ndarray:
    """[..., nbytes] -> [..., dim] {0,1} (simd.rs:153-163)."""
    if _native.available():
        return _native.unpack_binary(packed, dim)
    return np.unpackbits(packed, axis=-1, bitorder="big")[..., :dim]


# ---------------------------------------------------------------------------
# generic ex-codes (LSB-first bitstream)
# ---------------------------------------------------------------------------

def pack_ex_generic(ex: np.ndarray, ex_bits: int) -> np.ndarray:
    """[..., D] codes -> [..., ceil(D*ex_bits/8)] LSB-first bitstream
    (simd.rs:166-191)."""
    assert 0 < ex_bits <= 16
    ex = ex.astype(np.uint32)
    shifts = np.arange(ex_bits, dtype=np.uint32)
    bits = (ex[..., None] >> shifts) & 1  # [..., D, ex_bits] LSB-first per code
    flat = bits.reshape(*ex.shape[:-1], ex.shape[-1] * ex_bits).astype(np.uint8)
    return np.packbits(flat, axis=-1, bitorder="little")


def unpack_ex_generic(packed: np.ndarray, dim: int, ex_bits: int) -> np.ndarray:
    """Inverse of :func:`pack_ex_generic` (simd.rs:194-223)."""
    assert 0 < ex_bits <= 16
    nbits = dim * ex_bits
    bits = np.unpackbits(packed, axis=-1, bitorder="little")[..., :nbits]
    bits = bits.reshape(*packed.shape[:-1], dim, ex_bits).astype(np.uint32)
    weights = (1 << np.arange(ex_bits, dtype=np.uint32))
    return np.sum(bits * weights, axis=-1).astype(np.uint16)


# ---------------------------------------------------------------------------
# C++-compatible interleaved ex-code packings (simd.rs:2406-2695)
# ---------------------------------------------------------------------------

def pack_ex_2bit_cpp(ex: np.ndarray) -> np.ndarray:
    """16 2-bit codes -> 4 bytes; byte j holds codes j, 4+j, 8+j, 12+j
    (simd.rs:2478-2541)."""
    d = ex.shape[-1]
    assert d % 16 == 0
    c = (ex.astype(np.uint8) & 0x3).reshape(*ex.shape[:-1], d // 16, 4, 4)
    # c[..., g, i, j]: code index 4*i + j; byte j = sum_i c[..., i, j] << 2i
    out = (
        c[..., 0, :]
        | (c[..., 1, :] << 2)
        | (c[..., 2, :] << 4)
        | (c[..., 3, :] << 6)
    )
    return out.reshape(*ex.shape[:-1], d // 16 * 4)


def unpack_ex_2bit_cpp(packed: np.ndarray, dim: int) -> np.ndarray:
    """Inverse of :func:`pack_ex_2bit_cpp` (simd.rs:2551-2583)."""
    assert dim % 16 == 0
    b = packed.reshape(*packed.shape[:-1], dim // 16, 1, 4)
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(4, 1)
    codes = (b >> shifts) & 0x3  # [..., G, 4(i), 4(j)] -> code 4*i+j
    return codes.reshape(*packed.shape[:-1], dim).astype(np.uint16)


def pack_ex_6bit_cpp(ex: np.ndarray) -> np.ndarray:
    """16 6-bit codes -> 12 bytes: 8 bytes of low nibbles + 4 bytes of the
    upper-2-bit plane (simd.rs:2601-2695)."""
    d = ex.shape[-1]
    assert d % 16 == 0
    c = (ex.astype(np.uint8) & 0x3F).reshape(*ex.shape[:-1], d // 16, 16)
    low = c & 0x0F
    lo_bytes = low[..., 0:8] | (low[..., 8:16] << 4)  # [..., G, 8]
    hi = (c >> 4) & 0x3  # upper 2 bits
    h = hi.reshape(*hi.shape[:-1], 4, 4)  # [..., G, i, j] code 4i+j
    hi_bytes = (
        h[..., 0, :]
        | (h[..., 1, :] << 2)
        | (h[..., 2, :] << 4)
        | (h[..., 3, :] << 6)
    )  # [..., G, 4]
    out = np.concatenate([lo_bytes, hi_bytes], axis=-1)  # [..., G, 12]
    return out.reshape(*ex.shape[:-1], d // 16 * 12)


def unpack_ex_6bit_cpp(packed: np.ndarray, dim: int) -> np.ndarray:
    """Inverse of :func:`pack_ex_6bit_cpp` (simd.rs:2705-2766)."""
    assert dim % 16 == 0
    g = packed.reshape(*packed.shape[:-1], dim // 16, 12)
    lo_bytes = g[..., 0:8]
    hi_bytes = g[..., 8:12].reshape(*g.shape[:-2], dim // 16, 1, 4)
    low = np.concatenate([lo_bytes & 0x0F, lo_bytes >> 4], axis=-1)  # [..., G, 16]
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(4, 1)
    hi = ((hi_bytes >> shifts) & 0x3).reshape(*g.shape[:-2], dim // 16, 16)
    return (low | (hi << 4)).reshape(*packed.shape[:-1], dim).astype(np.uint16)


def pack_ex(ex: np.ndarray, ex_bits: int) -> np.ndarray:
    """Dispatch matching ``quantize_with_centroid`` packing
    (``quantizer.rs:212-243``): cpp-compatible formats for ex_bits 2/6 when
    dim is a multiple of 16 (1-bit cpp packing is bit-identical to the
    generic stream), generic LSB-first bitstream otherwise. ex_bits == 0
    packs to nothing (``ivf.rs:688``: empty ex_codes for binary-only)."""
    dim = ex.shape[-1]
    if ex_bits == 0:
        return np.zeros((*ex.shape[:-1], 0), np.uint8)
    native = _native.available()
    if dim % 16 == 0:
        if ex_bits == 2:
            return _native.pack_ex_cpp(ex, 2) if native else pack_ex_2bit_cpp(ex)
        if ex_bits == 6:
            return _native.pack_ex_cpp(ex, 6) if native else pack_ex_6bit_cpp(ex)
    if native:
        return _native.pack_ex_generic(ex, ex_bits)
    return pack_ex_generic(ex, ex_bits)


def unpack_ex(packed: np.ndarray, dim: int, ex_bits: int) -> np.ndarray:
    """Dispatch matching ``simd::unpack_ex_code`` (``simd.rs:101-134``)."""
    if ex_bits == 0:
        return np.zeros((*packed.shape[:-1], dim), np.uint16)
    native = _native.available()
    if dim % 16 == 0:
        if ex_bits == 2:
            return _native.unpack_ex_cpp(packed, dim, 2) if native else unpack_ex_2bit_cpp(packed, dim)
        if ex_bits == 6:
            return _native.unpack_ex_cpp(packed, dim, 6) if native else unpack_ex_6bit_cpp(packed, dim)
    if native:
        return _native.unpack_ex_generic(packed, dim, ex_bits)
    return unpack_ex_generic(packed, dim, ex_bits)


# ---------------------------------------------------------------------------
# FastScan 32-vector batch transpose (simd.rs:864-960)
# ---------------------------------------------------------------------------

def pack_codes(packed_rows: np.ndarray) -> np.ndarray:
    """FastScan transpose of binary code bytes.

    ``packed_rows``: [num_batches, 32, dim_bytes] MSB-first packed binary
    codes (zero-padded to full batches). Returns
    [num_batches, dim_bytes * 32] bytes in the reference batch layout
    (``pack_codes``, simd.rs:864-904).
    """
    nb, bs, dim_bytes = packed_rows.shape
    assert bs == FASTSCAN_BATCH_SIZE
    if _native.available():
        return _native.pack_codes(packed_rows)
    col = np.transpose(packed_rows, (0, 2, 1))  # [nb, dim_bytes, 32]
    col0 = col >> 4
    col1 = col & 15
    lo = KPERM0
    hi = KPERM0 + 16
    val0 = col0[..., lo] | (col0[..., hi] << 4)  # [nb, dim_bytes, 16]
    val1 = col1[..., lo] | (col1[..., hi] << 4)
    out = np.concatenate([val0, val1], axis=-1)  # [nb, dim_bytes, 32]
    return out.reshape(nb, dim_bytes * 32)


def unpack_codes(batch_packed: np.ndarray, dim_bytes: int) -> np.ndarray:
    """Inverse of :func:`pack_codes`: returns [num_batches, 32, dim_bytes]
    MSB-first packed rows (``unpack_single_vector``, simd.rs:915-960, for
    all 32 lanes at once)."""
    nb = batch_packed.shape[0]
    if _native.available():
        return _native.unpack_codes(batch_packed, dim_bytes)
    data = batch_packed.reshape(nb, dim_bytes, 32)
    val0 = data[..., :16]  # [nb, dim_bytes, 16]
    val1 = data[..., 16:]
    col0 = np.zeros((nb, dim_bytes, 32), np.uint8)
    col1 = np.zeros((nb, dim_bytes, 32), np.uint8)
    col0[..., KPERM0] = val0 & 15
    col0[..., KPERM0 + 16] = val0 >> 4
    col1[..., KPERM0] = val1 & 15
    col1[..., KPERM0 + 16] = val1 >> 4
    col = (col0 << 4) | col1  # [nb, dim_bytes, 32]
    return np.transpose(col, (0, 2, 1)).copy()  # [nb, 32, dim_bytes]
