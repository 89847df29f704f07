"""Distance estimator formulas.

The single source of truth for the RaBitQ distance estimates, shared by the
IVF scan, the brute-force index and MSTG — mirrors the reference's
scalar statement of the math (``ivf.rs:2203-2218`` naive scan and
``simd.rs:2039-2060`` batch assembly):

  binary_term  = <binary_code, q_rot> + c1 * sum(q),   c1 = -0.5
  est          = f_add + g_add + f_rescale * binary_term
  lower_bound  = est - f_error * g_error
  total_term   = 2^ex_bits * <binary_code, q_rot> + <ex_code, q_rot>
                 + cb * sum(q),                        cb = -(2^ex_bits - .5)
  dist_ex      = f_add_ex + g_add + f_rescale_ex * total_term

where g_add = ||q - c||^2 (L2) or -<q, c> (IP) and g_error = ||q - c||
(``ivf.rs:1850-1857``).

On TPU the inner products are batched matmuls over int8 code planes; the CPU
reference instead approximates <binary, q> with an i8-quantized LUT + AVX
shuffles (``simd.rs:972-1186``). Computing the dot directly on the MXU is
both simpler and *more accurate* than the LUT path, so our "fastscan"
equivalent has no LUT quantization error term.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import Metric


class QueryConstants(NamedTuple):
    """Per-query precomputed constants (``QueryPrecomputed``,
    ``ivf.rs:848-878``)."""

    sum_q: jax.Array  # [...]: sum of rotated query entries
    k1x_sum_q: jax.Array  # c1 * sum_q
    kbx_sum_q: jax.Array  # cb * sum_q
    binary_scale: float  # 2^ex_bits


def query_constants(q_rot: jax.Array, ex_bits: int) -> QueryConstants:
    sum_q = jnp.sum(q_rot, axis=-1)
    c1 = -0.5
    cb = -((1 << ex_bits) - 0.5)
    return QueryConstants(
        sum_q=sum_q,
        k1x_sum_q=c1 * sum_q,
        kbx_sum_q=cb * sum_q,
        binary_scale=float(1 << ex_bits),
    )


def g_terms(q_rot: jax.Array, centroids: jax.Array, metric: Metric):
    """Per-(query, centroid) g_add / g_error terms (``ivf.rs:1850-1857``).

    q_rot [B, D], centroids [C, D] -> (g_add [B, C], g_error [B, C],
    cent_sq_dist [B, C], cent_dot [B, C]).
    """
    q = jnp.asarray(q_rot, jnp.float32)
    c = jnp.asarray(centroids, jnp.float32)
    dot = q @ c.T  # [B, C]
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    c_sq = jnp.sum(c * c, axis=-1)[None, :]
    sq_dist = jnp.maximum(q_sq + c_sq - 2.0 * dot, 0.0)
    g_add = sq_dist if metric is Metric.L2 else -dot
    g_error = jnp.sqrt(sq_dist)
    return g_add, g_error, sq_dist, dot


def est_1bit(
    f_add: jax.Array,
    g_add: jax.Array,
    f_rescale: jax.Array,
    binary_dot: jax.Array,
    k1x_sum_q: jax.Array,
) -> jax.Array:
    """1-bit distance estimate (``simd.rs:2058``)."""
    return f_add + g_add + f_rescale * (binary_dot + k1x_sum_q)


def lower_bound(est: jax.Array, f_error: jax.Array, g_error: jax.Array) -> jax.Array:
    """Pruning lower bound (``simd.rs:2059``)."""
    return est - f_error * g_error


def est_extended(
    f_add_ex: jax.Array,
    g_add: jax.Array,
    f_rescale_ex: jax.Array,
    binary_dot: jax.Array,
    ex_dot: jax.Array,
    binary_scale: float,
    kbx_sum_q: jax.Array,
) -> jax.Array:
    """Extended-code refined distance (``ivf.rs:2093-2099``)."""
    total_term = binary_scale * binary_dot + ex_dot + kbx_sum_q
    return f_add_ex + g_add + f_rescale_ex * total_term


def scores_from_distances(dist: jax.Array, metric: Metric) -> jax.Array:
    """Reference reports distance for L2 and -distance for IP
    (``ivf.rs:2106-2109``; results ordered best-first either way)."""
    return dist if metric is Metric.L2 else -dist
