"""Shared device-resident code-building pipeline.

One jitted program per build: rows stream through rotation (optional),
per-row centroid gather, and the vectorized RaBitQ quantizer in fixed-size
chunks under ``lax.map`` — a single dispatch and two bulk transfers
(data in, codes out) instead of a host round-trip per chunk. Used by the
IVF, brute-force and MSTG builders.

This replaces the reference's rayon per-vector quantization loops
(``ivf.rs:1157-1183``, ``brute_force.rs:257-275``,
``mstg/posting_list.rs:67-107``) with MXU/VPU passes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..types import Metric
from ..ops.quantize import quantize_block
from ..ops.rotation import Rotator


@functools.partial(
    jax.jit,
    static_argnames=("rotate_fn", "chunk", "ex_bits", "metric", "use_t_const"),
)
def _build_codes_jit(
    data: jax.Array,  # [N_pad, dim] rows (pre-sorted into storage order)
    centroids: jax.Array,  # [C, Dq] in quantization space
    assign: jax.Array,  # [N_pad] int32
    t_const: jax.Array,
    *,
    rotate_fn,  # None or a pure fn [m, dim] -> [m, Dq]
    chunk: int,
    ex_bits: int,
    metric: Metric,
    use_t_const: bool,
):
    n_pad, dim = data.shape
    n_chunks = n_pad // chunk

    def one(args):
        blk, a = args
        if rotate_fn is not None:
            blk = rotate_fn(blk)
        cents = jnp.take(centroids, a, axis=0)
        qb = quantize_block(
            blk,
            cents,
            ex_bits=ex_bits,
            metric=metric,
            t_const=t_const,
            use_t_const=use_t_const,
        )
        ex = qb.ex.astype(jnp.uint8) if ex_bits <= 8 else qb.ex
        return (
            qb.binary.astype(jnp.uint8),
            ex,
            qb.delta,
            qb.vl,
            qb.f_add,
            qb.f_rescale,
            qb.f_error,
            qb.f_add_ex,
            qb.f_rescale_ex,
            qb.residual_norm,
        )

    outs = jax.lax.map(
        one,
        (
            data.reshape(n_chunks, chunk, dim),
            assign.reshape(n_chunks, chunk),
        ),
    )
    return tuple(o.reshape(n_pad, *o.shape[2:]) for o in outs)


_FIELDS = (
    "binary",
    "ex",
    "delta",
    "vl",
    "f_add",
    "f_rescale",
    "f_error",
    "f_add_ex",
    "f_rescale_ex",
    "residual_norm",
)


def build_codes(
    data: np.ndarray,  # [N, dim] rows in desired storage order
    centroids: np.ndarray,  # [C, Dq] in quantization space
    assign: np.ndarray,  # [N] cluster of each row
    *,
    rotator: Rotator | None,
    ex_bits: int,
    metric: Metric,
    use_t_const: bool,
    t_const: float = 0.0,
    chunk: int | None = None,
) -> dict[str, np.ndarray]:
    """Quantize all rows on device; returns host arrays keyed by field.

    ``binary`` [N, Dq] uint8, ``ex`` [N, Dq] uint16, scalars [N] f32.
    """
    n, dim = data.shape
    if chunk is None:
        chunk = 8192 if (use_t_const or ex_bits == 0) else 256
    chunk = min(chunk, max(128, n))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    data_pad = np.zeros((n_pad, dim), np.float32)
    data_pad[:n] = data
    assign_pad = np.zeros(n_pad, np.int32)
    assign_pad[:n] = assign

    rotate_fn = rotator.rotate if rotator is not None else None
    outs = _build_codes_jit(
        jnp.asarray(data_pad),
        jnp.asarray(centroids),
        jnp.asarray(assign_pad),
        jnp.float32(t_const),
        rotate_fn=rotate_fn,
        chunk=chunk,
        ex_bits=ex_bits,
        metric=metric,
        use_t_const=bool(use_t_const and ex_bits > 0),
    )
    result = {}
    for name, arr in zip(_FIELDS, outs):
        host = np.asarray(arr)[:n]
        if name == "ex":
            host = host.astype(np.uint16)
        result[name] = host
    return result
