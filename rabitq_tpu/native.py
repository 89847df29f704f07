"""ctypes loader for the native C++ codec library.

``make native`` builds ``rabitq_tpu/_native.so`` from ``native/packing.cpp``.
When present, ``ops/packing.py`` routes the hot host-side codecs (bit
packing, FastScan batch transpose) through it; otherwise the vectorized
numpy implementations are used. Both are tested against each other.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(__file__), "_native.so")


def _try_build() -> bool:
    """Best-effort build if a compiler is available (used by `load(build=True)`)."""
    src = os.path.join(os.path.dirname(__file__), os.pardir, "native", "packing.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load(build: bool = False):
    """Return the loaded native library or None."""
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED and not build:
        return None
    _TRIED = True
    if not os.path.exists(_SO_PATH) and build:
        _try_build()
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    if lib.rbq_native_abi_version() != 1:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    sz = ctypes.c_size_t
    lib.rbq_pack_binary.argtypes = [u8p, sz, sz, u8p]
    lib.rbq_unpack_binary.argtypes = [u8p, sz, sz, u8p]
    lib.rbq_pack_ex_generic.argtypes = [u16p, sz, sz, ctypes.c_int, u8p]
    lib.rbq_unpack_ex_generic.argtypes = [u8p, sz, sz, ctypes.c_int, u16p]
    lib.rbq_pack_ex_2bit.argtypes = [u16p, sz, sz, u8p]
    lib.rbq_unpack_ex_2bit.argtypes = [u8p, sz, sz, u16p]
    lib.rbq_pack_ex_6bit.argtypes = [u16p, sz, sz, u8p]
    lib.rbq_unpack_ex_6bit.argtypes = [u8p, sz, sz, u16p]
    lib.rbq_pack_codes.argtypes = [u8p, sz, sz, u8p]
    lib.rbq_unpack_codes.argtypes = [u8p, sz, sz, u8p]
    lib.rbq_crc32.argtypes = [ctypes.c_uint32, u8p, sz]
    lib.rbq_crc32.restype = ctypes.c_uint32
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


# --- numpy-facing wrappers (contiguous arrays required) -------------------

def pack_binary(bits: np.ndarray) -> np.ndarray:
    lib = load()
    bits = np.ascontiguousarray(bits, np.uint8)
    n = int(np.prod(bits.shape[:-1])) if bits.ndim > 1 else 1
    dim = bits.shape[-1]
    out = np.empty((*bits.shape[:-1], (dim + 7) // 8), np.uint8)
    lib.rbq_pack_binary(_ptr(bits, ctypes.c_uint8), n, dim, _ptr(out, ctypes.c_uint8))
    return out


def unpack_binary(packed: np.ndarray, dim: int) -> np.ndarray:
    lib = load()
    packed = np.ascontiguousarray(packed, np.uint8)
    n = int(np.prod(packed.shape[:-1])) if packed.ndim > 1 else 1
    out = np.empty((*packed.shape[:-1], dim), np.uint8)
    lib.rbq_unpack_binary(_ptr(packed, ctypes.c_uint8), n, dim, _ptr(out, ctypes.c_uint8))
    return out


def pack_ex_generic(ex: np.ndarray, ex_bits: int) -> np.ndarray:
    lib = load()
    ex = np.ascontiguousarray(ex, np.uint16)
    n = int(np.prod(ex.shape[:-1])) if ex.ndim > 1 else 1
    dim = ex.shape[-1]
    out = np.empty((*ex.shape[:-1], (dim * ex_bits + 7) // 8), np.uint8)
    lib.rbq_pack_ex_generic(
        _ptr(ex, ctypes.c_uint16), n, dim, ex_bits, _ptr(out, ctypes.c_uint8)
    )
    return out


def unpack_ex_generic(packed: np.ndarray, dim: int, ex_bits: int) -> np.ndarray:
    lib = load()
    packed = np.ascontiguousarray(packed, np.uint8)
    n = int(np.prod(packed.shape[:-1])) if packed.ndim > 1 else 1
    out = np.empty((*packed.shape[:-1], dim), np.uint16)
    lib.rbq_unpack_ex_generic(
        _ptr(packed, ctypes.c_uint8), n, dim, ex_bits, _ptr(out, ctypes.c_uint16)
    )
    return out


def pack_ex_cpp(ex: np.ndarray, ex_bits: int) -> np.ndarray:
    lib = load()
    ex = np.ascontiguousarray(ex, np.uint16)
    n = int(np.prod(ex.shape[:-1])) if ex.ndim > 1 else 1
    dim = ex.shape[-1]
    width = dim // 16 * (4 if ex_bits == 2 else 12)
    out = np.empty((*ex.shape[:-1], width), np.uint8)
    fn = lib.rbq_pack_ex_2bit if ex_bits == 2 else lib.rbq_pack_ex_6bit
    fn(_ptr(ex, ctypes.c_uint16), n, dim, _ptr(out, ctypes.c_uint8))
    return out


def unpack_ex_cpp(packed: np.ndarray, dim: int, ex_bits: int) -> np.ndarray:
    lib = load()
    packed = np.ascontiguousarray(packed, np.uint8)
    n = int(np.prod(packed.shape[:-1])) if packed.ndim > 1 else 1
    out = np.zeros((*packed.shape[:-1], dim), np.uint16)
    fn = lib.rbq_unpack_ex_2bit if ex_bits == 2 else lib.rbq_unpack_ex_6bit
    fn(_ptr(packed, ctypes.c_uint8), n, dim, _ptr(out, ctypes.c_uint16))
    return out


def pack_codes(rows: np.ndarray) -> np.ndarray:
    lib = load()
    rows = np.ascontiguousarray(rows, np.uint8)
    nb, bs, dim_bytes = rows.shape
    assert bs == 32
    out = np.empty((nb, dim_bytes * 32), np.uint8)
    lib.rbq_pack_codes(_ptr(rows, ctypes.c_uint8), nb, dim_bytes, _ptr(out, ctypes.c_uint8))
    return out


def unpack_codes(packed: np.ndarray, dim_bytes: int) -> np.ndarray:
    lib = load()
    packed = np.ascontiguousarray(packed, np.uint8)
    nb = packed.shape[0]
    out = np.empty((nb, 32, dim_bytes), np.uint8)
    lib.rbq_unpack_codes(_ptr(packed, ctypes.c_uint8), nb, dim_bytes, _ptr(out, ctypes.c_uint8))
    return out


def crc32(data: bytes, crc: int = 0) -> int:
    lib = load()
    buf = np.frombuffer(data, np.uint8)
    if buf.size == 0:
        return crc
    return int(lib.rbq_crc32(ctypes.c_uint32(crc), _ptr(buf, ctypes.c_uint8), buf.size))
