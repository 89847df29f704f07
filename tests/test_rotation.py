"""Rotator tests — mirror the reference's colocated tests
(rotation.rs:608-820): FHT self-inverse, norm preservation, exact inverse
for power-of-2 and non-power-of-2 dims, serialization round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rabitq_tpu.ops.rotation import (
    FhtKacRotator,
    MatrixRotator,
    deserialize_rotator,
    fht,
    make_rotator,
)
from rabitq_tpu.types import RotatorType


def test_fht_self_inverse():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    y = fht(fht(x))
    np.testing.assert_allclose(np.asarray(y), np.arange(1, 5) * 4.0, rtol=1e-5)


def test_fht_batched_matches_loop(rng):
    x = rng.standard_normal((5, 64)).astype(np.float32)
    batched = np.asarray(fht(jnp.asarray(x)))
    for i in range(5):
        single = np.asarray(fht(jnp.asarray(x[i])))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5)


@pytest.mark.parametrize("dim", [64, 128, 960, 100, 130])
def test_fht_rotator_inverse(dim, rng):
    rot = FhtKacRotator(dim, seed=7)
    x = rng.standard_normal((3, dim)).astype(np.float32)
    y = np.asarray(rot.rotate(jnp.asarray(x)))
    assert y.shape == (3, rot.padded_dim)
    back = np.asarray(rot.inverse_rotate(jnp.asarray(y)))
    np.testing.assert_allclose(back, x, atol=2e-3)


@pytest.mark.parametrize("dim", [64, 960, 100])
def test_fht_preserves_norm(dim, rng):
    rot = FhtKacRotator(dim, seed=3)
    x = rng.standard_normal((4, dim)).astype(np.float32)
    y = np.asarray(rot.rotate(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4
    )


@pytest.mark.parametrize("dim", [16, 100])
def test_matrix_rotator_inverse_and_norm(dim, rng):
    rot = MatrixRotator(dim, seed=5)
    x = rng.standard_normal((3, dim)).astype(np.float32)
    y = np.asarray(rot.rotate(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4
    )
    back = np.asarray(rot.inverse_rotate(jnp.asarray(y)))
    np.testing.assert_allclose(back, x, atol=1e-3)


@pytest.mark.parametrize(
    "rt", [RotatorType.FhtKacRotator, RotatorType.MatrixRotator]
)
def test_serialize_roundtrip(rt, rng):
    dim = 128
    rot = make_rotator(dim, rt, seed=11)
    blob = rot.serialize()
    rot2 = deserialize_rotator(dim, rot.padded_dim, rt, blob)
    x = rng.standard_normal((2, dim)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(rot.rotate(jnp.asarray(x))),
        np.asarray(rot2.rotate(jnp.asarray(x))),
    )


def test_padding_requirement():
    assert RotatorType.FhtKacRotator.padding_requirement(960) == 960
    assert RotatorType.FhtKacRotator.padding_requirement(100) == 128
    assert RotatorType.MatrixRotator.padding_requirement(100) == 100


@pytest.mark.parametrize("dim", [64, 128, 100, 60])
def test_rotate_np_matches_device(dim, rng):
    """Host numpy rotation mirrors the device path (used by the exact
    t-sweep so build-time flows avoid tunnel round trips)."""
    x = rng.standard_normal((16, dim)).astype(np.float32)
    for make in (
        lambda: FhtKacRotator(dim, seed=3),
        lambda: MatrixRotator(dim, seed=3),
    ):
        rot = make()
        dev = np.asarray(jax.jit(rot.rotate)(jnp.asarray(x)))
        host = rot.rotate_np(x)
        assert host.shape == dev.shape
        np.testing.assert_allclose(host, dev, rtol=2e-6, atol=2e-6)
