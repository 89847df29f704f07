"""Pallas TPU kernel: fast Hadamard transform.

The XLA FHT in ``ops/rotation.py`` runs log2(n) reshape/stack butterfly
passes, each materializing the [B, n] block. This kernel keeps the block
in VMEM and performs all log2(n) stages in-register using lane rolls:

    stage h:  out[j] = x[j] + x[j+h]   if (j & h) == 0
              out[j] = x[j-h] - x[j]   otherwise

(the reference CPU butterfly, lqhl/rabitq-rs ``rotation.rs:292-312``,
restated with rolls so every stage is two vector shifts + a select).

Used by the FhtKac rotator for the power-of-2 sub-transforms when running
on TPU; the XLA path remains the fallback (CPU backends, odd shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_VMEM_N = 8192  # block width kept fully VMEM-resident
_TB = 256  # rows per grid step


def _fht_kernel(x_ref, o_ref, *, n: int):
    x = x_ref[:].astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    h = 1
    while h < n:
        # pltpu.roll requires non-negative shifts: n - h rolls left by h
        plus = pltpu.roll(x, n - h, axis=1)  # x[j + h]
        minus = pltpu.roll(x, h, axis=1)  # x[j - h]
        lo = (idx & h) == 0
        x = jnp.where(lo, x + plus, minus - x)
        h *= 2
    o_ref[:] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fht_pallas_2d(x: jax.Array, interpret: bool = False) -> jax.Array:
    b, n = x.shape
    grid = (max(b // _TB, 1),)
    tb = min(_TB, b)
    return pl.pallas_call(
        functools.partial(_fht_kernel, n=n),
        grid=grid,
        in_specs=[pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret,
    )(x)


def fht_pallas(x: jax.Array) -> jax.Array:
    """Unnormalized FHT along the last axis via the Pallas kernel.

    Accepts [..., n] with power-of-2 n; rows are processed in VMEM tiles.
    Falls back to interpret mode off-TPU so the same code path is testable
    on CPU.
    """
    n = x.shape[-1]
    assert n & (n - 1) == 0, f"FHT requires power-of-2 length, got {n}"
    shape = x.shape
    flat = x.reshape(-1, n).astype(jnp.float32)
    b = flat.shape[0]
    pad = (-b) % min(_TB, max(b, 8))
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    out = _fht_pallas_2d(flat, interpret=interpret)
    if pad:
        out = out[:b]
    return out.reshape(shape)


def fht_supported(n: int, batch: int) -> bool:
    """Whether the Pallas kernel applies (power-of-2 n within VMEM budget)."""
    return n & (n - 1) == 0 and 128 <= n <= _MAX_VMEM_N and batch >= 1
