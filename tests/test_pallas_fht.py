"""Pallas FHT kernel: exact equivalence with the XLA butterflies
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rabitq_tpu.ops.pallas_fht import fht_pallas, fht_supported
from rabitq_tpu.ops.rotation import fht


@pytest.mark.parametrize("n", [128, 512, 1024])
@pytest.mark.parametrize("b", [1, 7, 40])
def test_fht_pallas_matches_xla(n, b, rng):
    x = rng.standard_normal((b, n)).astype(np.float32)
    a = np.asarray(fht_pallas(jnp.asarray(x)))
    want = np.asarray(fht(jnp.asarray(x)))
    np.testing.assert_array_equal(a, want)


def test_fht_supported_gates():
    assert fht_supported(512, 10)
    assert not fht_supported(500, 10)  # not a power of 2
    assert not fht_supported(64, 10)  # below lane width
    assert not fht_supported(1 << 15, 10)  # beyond VMEM budget
