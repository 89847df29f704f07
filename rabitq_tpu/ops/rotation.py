"""Random rotators, TPU-native.

Re-implements the semantics of the reference rotators
(lqhl/rabitq-rs ``src/rotation.rs``):

* ``FhtKacRotator`` — 4 rounds of (sign-flip -> fast Hadamard transform ->
  rescale), with Kac's-walk mixing for non-power-of-2 dims and padding to a
  multiple of 64 (``rotation.rs:238-400``). The FHT here is expressed as
  log2(n) vectorized butterfly steps (reshape/stack), which XLA fuses into a
  handful of VPU passes — there is no scalar loop, and the whole transform
  vmaps over the batch dimension.
* ``MatrixRotator`` — a random orthonormal matrix, applied as a single
  matmul on the MXU (``rotation.rs:73-233``).

Serialization formats are byte-compatible with the reference so persisted
indices interchange: FhtKac stores only the 4*padded/8 flip-bit bytes
(``rotation.rs:486-489``, LSB-first bit order within each byte,
``rotation.rs:278-289``); Matrix stores the row-major padded^2 f32 matrix
little-endian (``rotation.rs:205-211``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import InvalidPersistence
from ..types import RotatorType


def _floor_log2(x: int) -> int:
    assert x > 0
    return x.bit_length() - 1


def fht(x: jax.Array) -> jax.Array:
    """Unnormalized fast Hadamard transform along the last axis.

    Matches the reference butterfly (``rotation.rs:292-312``); self-inverse up
    to a factor of n. Implemented as log2(n) reshape/stack butterflies so the
    compiler sees static-shaped, fully vectorized element-wise ops.
    """
    n = x.shape[-1]
    assert n & (n - 1) == 0, f"FHT requires power-of-2 length, got {n}"
    batch_shape = x.shape[:-1]
    for step in range(_floor_log2(n)):
        h = 1 << step
        y = x.reshape(*batch_shape, n // (2 * h), 2, h)
        a = y[..., 0, :]
        b = y[..., 1, :]
        x = jnp.stack([a + b, a - b], axis=-2).reshape(*batch_shape, n)
    return x


def _fht_dispatch(x: jax.Array) -> jax.Array:
    """FHT via the Pallas kernel on TPU, XLA butterflies elsewhere."""
    n = x.shape[-1]
    if jax.default_backend() == "tpu":
        from .pallas_fht import fht_pallas, fht_supported

        batch = 1
        for s in x.shape[:-1]:
            batch *= s
        if fht_supported(n, batch):
            return fht_pallas(x)
    return fht(x)


def fht_np(x: np.ndarray) -> np.ndarray:
    """Host numpy FHT mirroring :func:`fht` (build-time flows that must not
    round-trip the device — e.g. the exact t-sweep — and CPU-only loads)."""
    n = x.shape[-1]
    assert n & (n - 1) == 0, f"FHT requires power-of-2 length, got {n}"
    batch_shape = x.shape[:-1]
    for step in range(_floor_log2(n)):
        h = 1 << step
        y = x.reshape(*batch_shape, n // (2 * h), 2, h)
        a = y[..., 0, :]
        b = y[..., 1, :]
        x = np.stack([a + b, a - b], axis=-2).reshape(*batch_shape, n)
    return x


def kacs_walk(x: jax.Array) -> jax.Array:
    """Kac's walk mixing step (``rotation.rs:315-324``): split the vector in
    halves and replace them with (a+b, a-b). Self-inverse up to a factor 2."""
    n = x.shape[-1]
    half = n // 2
    a = x[..., :half]
    b = x[..., half:]
    return jnp.concatenate([a + b, a - b], axis=-1)


class FhtKacRotator:
    """FHT + Kac-walk rotator (``rotation.rs:238-511``).

    Holds flip bits on the host and precomputed sign vectors on device.
    ``rotate``/``inverse_rotate`` are pure jnp functions of their input and
    can be called inside jit (the sign arrays are closed-over constants).
    """

    rotator_type = RotatorType.FhtKacRotator

    def __init__(self, dim: int, seed: int | None = 0, flip: np.ndarray | None = None):
        padded_dim = RotatorType.FhtKacRotator.padding_requirement(dim)
        assert padded_dim % 64 == 0
        self.dim = dim
        self.padded_dim = padded_dim
        flip_bytes = 4 * padded_dim // 8
        if flip is None:
            rng = np.random.default_rng(seed)
            flip = rng.integers(0, 256, size=flip_bytes, dtype=np.uint8)
        else:
            flip = np.asarray(flip, dtype=np.uint8)
            if flip.size != flip_bytes:
                raise InvalidPersistence("FHT rotator flip bits length mismatch")
        self.flip = flip
        # LSB-first bit order within each byte (rotation.rs:278-289).
        bits = np.unpackbits(flip.reshape(4, padded_dim // 8), axis=-1, bitorder="little")
        self._signs = jnp.asarray(1.0 - 2.0 * bits.astype(np.float32))  # [4, padded]
        self.trunc_dim = 1 << _floor_log2(dim)
        self.fac = 1.0 / float(np.sqrt(self.trunc_dim))

    # -- serialization (byte-compatible with rotation.rs:486-510) --
    def serialize(self) -> bytes:
        return self.flip.tobytes()

    @staticmethod
    def deserialize(dim: int, padded_dim: int, data: bytes) -> "FhtKacRotator":
        expected = 4 * padded_dim // 8
        if len(data) != expected:
            raise InvalidPersistence("FHT rotator flip bits length mismatch")
        return FhtKacRotator(dim, flip=np.frombuffer(data, dtype=np.uint8).copy())

    def _pad(self, x: jax.Array) -> jax.Array:
        pad = self.padded_dim - x.shape[-1]
        if pad:
            widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            x = jnp.pad(x, widths)
        return x

    def rotate(self, x: jax.Array) -> jax.Array:
        """Forward rotation: [..., dim] -> [..., padded_dim]
        (``rotation.rs:350-401``)."""
        x = jnp.asarray(x, jnp.float32)
        assert x.shape[-1] == self.dim, (x.shape, self.dim)
        out = self._pad(x)
        trunc, padded, fac = self.trunc_dim, self.padded_dim, self.fac
        if trunc == padded:
            for r in range(4):
                out = out * self._signs[r]
                out = _fht_dispatch(out) * fac
        else:
            start = padded - trunc
            for r in range(4):
                out = out * self._signs[r]
                if r % 2 == 0:
                    head = _fht_dispatch(out[..., :trunc]) * fac
                    out = jnp.concatenate([head, out[..., trunc:]], axis=-1)
                else:
                    tail = _fht_dispatch(out[..., start:]) * fac
                    out = jnp.concatenate([out[..., :start], tail], axis=-1)
                out = kacs_walk(out)
            out = out * 0.25
        return out

    def rotate_np(self, x: np.ndarray) -> np.ndarray:
        """Host numpy forward rotation, numerically mirroring :meth:`rotate`
        (same f32 butterflies / walk / scaling order)."""
        x = np.ascontiguousarray(x, np.float32)
        assert x.shape[-1] == self.dim
        pad = self.padded_dim - x.shape[-1]
        if pad:
            widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            x = np.pad(x, widths)
        out = x
        signs = np.asarray(self._signs)
        trunc, padded, fac = self.trunc_dim, self.padded_dim, self.fac
        if trunc == padded:
            for r in range(4):
                out = (out * signs[r]).astype(np.float32)
                out = (fht_np(out) * np.float32(fac)).astype(np.float32)
        else:
            start = padded - trunc
            for r in range(4):
                out = (out * signs[r]).astype(np.float32)
                if r % 2 == 0:
                    head = (fht_np(out[..., :trunc]) * np.float32(fac)).astype(np.float32)
                    out = np.concatenate([head, out[..., trunc:]], axis=-1)
                else:
                    tail = (fht_np(out[..., start:]) * np.float32(fac)).astype(np.float32)
                    out = np.concatenate([out[..., :start], tail], axis=-1)
                a = out[..., : padded // 2]
                b = out[..., padded // 2 :]
                out = np.concatenate([a + b, a - b], axis=-1).astype(np.float32)
            out = (out * np.float32(0.25)).astype(np.float32)
        return out

    def inverse_rotate(self, y: jax.Array) -> jax.Array:
        """Inverse rotation: [..., padded_dim] -> [..., dim]
        (``rotation.rs:410-480``)."""
        y = jnp.asarray(y, jnp.float32)
        assert y.shape[-1] == self.padded_dim
        trunc, padded, fac = self.trunc_dim, self.padded_dim, self.fac
        out = y
        if trunc == padded:
            for r in reversed(range(4)):
                out = _fht_dispatch(out / fac) / float(padded)
                out = out * self._signs[r]
        else:
            start = padded - trunc
            out = out * 4.0
            for r in reversed(range(4)):
                out = kacs_walk(out * 0.5)
                if r % 2 == 0:
                    head = _fht_dispatch(out[..., :trunc] / fac) / float(trunc)
                    out = jnp.concatenate([head, out[..., trunc:]], axis=-1)
                else:
                    tail = _fht_dispatch(out[..., start:] / fac) / float(trunc)
                    out = jnp.concatenate([out[..., :start], tail], axis=-1)
                out = out * self._signs[r]
        return out[..., : self.dim]


class MatrixRotator:
    """Random orthonormal matrix rotator (``rotation.rs:73-233``).

    The reference builds the basis by Gram-Schmidt over Gaussian rows; we use
    a QR decomposition of a Gaussian matrix (same orthonormal-ensemble
    semantics, one LAPACK call instead of an O(d^3) Python loop). Persisted
    matrices from the reference load and apply identically.
    """

    rotator_type = RotatorType.MatrixRotator

    def __init__(self, dim: int, seed: int | None = 0, matrix: np.ndarray | None = None):
        padded_dim = RotatorType.MatrixRotator.padding_requirement(dim)
        self.dim = dim
        self.padded_dim = padded_dim
        if matrix is None:
            rng = np.random.default_rng(seed)
            g = rng.standard_normal((padded_dim, padded_dim)).astype(np.float64)
            q, r = np.linalg.qr(g)
            q = q * np.sign(np.diag(r))[None, :]
            matrix = q.T.astype(np.float32)  # rows orthonormal
        else:
            matrix = np.asarray(matrix, dtype=np.float32).reshape(padded_dim, padded_dim)
        self._matrix_np = matrix
        self.matrix = jnp.asarray(matrix)  # [padded, padded], row-major

    def serialize(self) -> bytes:
        return self._matrix_np.astype("<f4").tobytes()

    @staticmethod
    def deserialize(dim: int, padded_dim: int, data: bytes) -> "MatrixRotator":
        expected = padded_dim * padded_dim * 4
        if len(data) != expected:
            raise InvalidPersistence("rotator matrix length mismatch")
        m = np.frombuffer(data, dtype="<f4").reshape(padded_dim, padded_dim).copy()
        return MatrixRotator(dim, matrix=m)

    def rotate(self, x: jax.Array) -> jax.Array:
        x = jnp.asarray(x, jnp.float32)
        assert x.shape[-1] == self.dim
        pad = self.padded_dim - self.dim
        if pad:
            widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            x = jnp.pad(x, widths)
        # output[row] = sum_j matrix[row, j] * x[j]  ->  x @ M^T
        return x @ self.matrix.T

    def rotate_np(self, x: np.ndarray) -> np.ndarray:
        """Host numpy forward rotation (mirrors :meth:`rotate`)."""
        x = np.ascontiguousarray(x, np.float32)
        assert x.shape[-1] == self.dim
        pad = self.padded_dim - self.dim
        if pad:
            widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            x = np.pad(x, widths)
        return x @ self._matrix_np.T

    def inverse_rotate(self, y: jax.Array) -> jax.Array:
        y = jnp.asarray(y, jnp.float32)
        assert y.shape[-1] == self.padded_dim
        # inverse = transpose: out[col] = sum_row M[row, col] * y[row] -> y @ M
        return (y @ self.matrix)[..., : self.dim]


Rotator = FhtKacRotator | MatrixRotator


def make_rotator(dim: int, rotator_type: RotatorType, seed: int | None = 0) -> Rotator:
    """Factory matching the reference ``DynamicRotator::new``
    (``rotation.rs:528-533``)."""
    if rotator_type == RotatorType.MatrixRotator:
        return MatrixRotator(dim, seed)
    return FhtKacRotator(dim, seed)


def deserialize_rotator(
    dim: int, padded_dim: int, rotator_type: RotatorType, data: bytes
) -> Rotator:
    """Matches ``DynamicRotator::deserialize`` (``rotation.rs:591-605``)."""
    if rotator_type == RotatorType.MatrixRotator:
        return MatrixRotator.deserialize(dim, padded_dim, data)
    return FhtKacRotator.deserialize(dim, padded_dim, data)
