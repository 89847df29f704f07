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
    t_rows: jax.Array,  # [N_pad] f32 per-row t (const-filled in faster mode)
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
        ord_c, a, t_c = args
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
            t_const=t_c,
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
            t_rows.reshape(n_chunks, chunk),
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


def exact_t_rows(
    data: np.ndarray,  # [N, dim] raw host rows
    centroids: np.ndarray | None,  # [C, dim] RAW (unrotated) centroids; None = zero
    assign: np.ndarray,  # [M] cluster of each output row
    order: np.ndarray | None,  # [M] source row per output row (None = identity)
    rotator: Rotator | None,
    ex_bits: int,
    chunk: int = 32768,
    centroids_rotated: np.ndarray | None = None,  # [C, Dq] ROTATED-space base
) -> np.ndarray:
    """Per-output-row exact rescale t, computed host-side.

    The reference's default (non-faster) builds use the exact event sweep
    per vector (``quantizer.rs:332``); this reproduces it without device
    round trips: rotation is linear, so the rotated residual is
    ``rotate(data_row - raw_centroid)`` computed with the host numpy FHT
    (``rotate_np``), then swept by :func:`best_rescale_factor_exact`.

    ``centroids_rotated`` subtracts the base AFTER rotation instead —
    required when the stored centroids are precision-rounded in rotated
    space (MSTG ``centroid_precision`` + ``use_rotator``): rounding does
    not commute with rotation, so the t sweep must see the same residual
    base ``rotate(row) - q(rotate(centroid))`` the codes are built about.
    """
    from ..ops.quantize import best_rescale_factor_exact

    assert centroids is None or centroids_rotated is None
    m = assign.shape[0]
    out = np.empty(m, np.float32)
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        rows = order[s:e] if order is not None else np.arange(s, e)
        resid = np.ascontiguousarray(data[rows], np.float32)
        if centroids is not None:
            resid = resid - centroids[assign[s:e]]
        if rotator is not None:
            resid = rotator.rotate_np(resid)
        if centroids_rotated is not None:
            resid = resid - centroids_rotated[assign[s:e]]
        o = np.abs(resid)
        norm = np.linalg.norm(o, axis=-1, keepdims=True)
        o = o / np.maximum(norm, np.finfo(np.float32).eps)
        # rows with ~zero residual get t=1.0 inside the sweep (max_o ~ 0)
        out[s:e] = best_rescale_factor_exact(o, ex_bits)
    return out


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
    t_rows: np.ndarray | None = None,  # [M] per-row exact t (overrides t_const)
    order: np.ndarray | None = None,  # [M] source row per output row
    chunk: int | None = None,
) -> tuple[dict[str, jax.Array], int]:
    """Quantize rows on device; returns ({field: device array [M_pad, ...]}, M).

    ``order`` selects and re-orders source rows (e.g. cluster-sorted
    storage order, or closure-replicated rows); rows are gathered on device
    so the dataset is uploaded exactly once. ``t_rows`` supplies the exact
    per-row rescale factors from :func:`exact_t_rows`; without it,
    ``use_t_const`` picks the faster constant-t mode and otherwise the
    device-side grid search runs.
    """
    m = assign.shape[0]
    n, dim = data.shape
    use_t = bool((use_t_const or t_rows is not None) and ex_bits > 0)
    if chunk is None:
        chunk = 8192 if (use_t or ex_bits == 0) else 256
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
    t_pad = np.full(m_pad, t_const, np.float32)
    if t_rows is not None:
        t_pad[:m] = t_rows

    rotate_fn = rotator.rotate if rotator is not None else None
    outs = _build_codes_jit(
        data if isinstance(data, jax.Array) else jnp.asarray(np.ascontiguousarray(data, np.float32)),
        centroids if isinstance(centroids, jax.Array) else jnp.asarray(np.ascontiguousarray(centroids, np.float32)),
        jnp.asarray(assign_pad),
        jnp.asarray(order_arr),
        jnp.asarray(t_pad),
        rotate_fn=rotate_fn,
        chunk=chunk,
        ex_bits=ex_bits,
        metric=metric,
        use_t_const=use_t,
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
    t_rows: np.ndarray | None = None,
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
        t_rows=t_rows,
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
