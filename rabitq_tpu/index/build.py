"""Shared device-resident code-building pipeline.

One jitted program per build: rows stream through an optional storage-order
gather, rotation (optional), per-row centroid gather, and the vectorized
RaBitQ quantizer in fixed-size chunks under ``lax.map``. Used by the IVF,
brute-force and MSTG builders.

This replaces the reference's rayon per-vector quantization loops
(``ivf.rs:1157-1183``, ``brute_force.rs:257-275``,
``mstg/posting_list.rs:67-107``) with MXU/VPU passes.

Host<->device transfers through this environment's TPU tunnel run at only
~20-40 MB/s, so the builder is careful to upload the dataset once and keep
outputs on device (``build_codes_device``); downloading host copies is the
caller's (lazy) decision.
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
    static_argnames=("rotate_fn", "chunk", "ex_bits", "metric", "use_t_const", "use_order"),
)
def _build_codes_jit(
    data: jax.Array,  # [N, dim] rows (any order)
    centroids: jax.Array,  # [C, Dq] in quantization space
    assign: jax.Array,  # [N_pad] int32, cluster of each OUTPUT row
    order: jax.Array,  # [N_pad] int32, source row of each OUTPUT row
    t_const: jax.Array,
    *,
    rotate_fn,  # None or a pure fn [m, dim] -> [m, Dq]
    chunk: int,
    ex_bits: int,
    metric: Metric,
    use_t_const: bool,
    use_order: bool,
):
    n_pad = assign.shape[0]
    n_chunks = n_pad // chunk

    def one(args):
        ord_c, a = args
        if use_order:
            blk = jnp.take(data, ord_c, axis=0)
        else:
            blk = jax.lax.dynamic_slice_in_dim(data, ord_c[0], chunk, axis=0)
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
            order.reshape(n_chunks, chunk),
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


def build_codes_device(
    data,  # np.ndarray or jax.Array [N, dim]
    centroids,  # np.ndarray or jax.Array [C, Dq]
    assign: np.ndarray,  # [M] cluster of each output row
    *,
    rotator: Rotator | None,
    ex_bits: int,
    metric: Metric,
    use_t_const: bool,
    t_const: float = 0.0,
    order: np.ndarray | None = None,  # [M] source row per output row
    chunk: int | None = None,
) -> tuple[dict[str, jax.Array], int]:
    """Quantize rows on device; returns ({field: device array [M_pad, ...]}, M).

    ``order`` selects and re-orders source rows (e.g. cluster-sorted
    storage order, or closure-replicated rows); rows are gathered on device
    so the dataset is uploaded exactly once.
    """
    m = assign.shape[0]
    n, dim = data.shape
    if chunk is None:
        chunk = 8192 if (use_t_const or ex_bits == 0) else 256
    chunk = min(chunk, max(128, m))
    m_pad = ((m + chunk - 1) // chunk) * chunk

    assign_pad = np.zeros(m_pad, np.int32)
    assign_pad[:m] = assign
    if order is None:
        order_arr = np.arange(m_pad, dtype=np.int32) % max(n, 1)
        use_order = m_pad != n  # padded tail must not run off the end
    else:
        order_arr = np.zeros(m_pad, np.int32)
        order_arr[:m] = order
        use_order = True

    rotate_fn = rotator.rotate if rotator is not None else None
    outs = _build_codes_jit(
        data if isinstance(data, jax.Array) else jnp.asarray(np.ascontiguousarray(data, np.float32)),
        centroids if isinstance(centroids, jax.Array) else jnp.asarray(np.ascontiguousarray(centroids, np.float32)),
        jnp.asarray(assign_pad),
        jnp.asarray(order_arr),
        jnp.float32(t_const),
        rotate_fn=rotate_fn,
        chunk=chunk,
        ex_bits=ex_bits,
        metric=metric,
        use_t_const=bool(use_t_const and ex_bits > 0),
        use_order=bool(use_order),
    )
    return dict(zip(_FIELDS, outs)), m


def build_codes(
    data: np.ndarray,
    centroids: np.ndarray,
    assign: np.ndarray,
    *,
    rotator: Rotator | None,
    ex_bits: int,
    metric: Metric,
    use_t_const: bool,
    t_const: float = 0.0,
    order: np.ndarray | None = None,
    chunk: int | None = None,
) -> dict[str, np.ndarray]:
    """Host-output convenience wrapper over :func:`build_codes_device`."""
    dev, m = build_codes_device(
        data,
        centroids,
        assign,
        rotator=rotator,
        ex_bits=ex_bits,
        metric=metric,
        use_t_const=use_t_const,
        t_const=t_const,
        order=order,
        chunk=chunk,
    )
    result = {}
    for name, arr in dev.items():
        host = np.asarray(arr)[:m]
        if name == "ex":
            host = host.astype(np.uint16)
        result[name] = host
    return result
