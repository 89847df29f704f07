"""Hierarchical balanced clustering for MSTG.

Semantics of the reference (lqhl/rabitq-rs ``mstg/clustering.rs``):
repeatedly pop any cluster larger than ``max_cluster_size``, split it with
k-means into ``branching_factor`` children, greedily rebalance oversized
children toward undersized ones, and keep going until every cluster fits.

The reference shuttles ``Vec<Vec<f32>>`` copies between clusters; here
clusters are index arrays into one [N, D] matrix and the k-means splits run
on device (``ops/kmeans.py``). The rebalance moves whole batches of the
closest vectors at once instead of one vector per iteration (the
reference's loop moves one vector per iteration with a 10-iteration cap,
``mstg/clustering.rs:133-208`` — batched moves reach the same balance
bound without O(moves) device round-trips).

The recursion is LEVEL-SYNCHRONOUS (round 3): every oversized cluster of
a level trains its child centroids on a fixed-size sampled subset (one
compiled program shape, reused across splits), then a single
group-restricted assignment pass (``ops.kmeans._grouped_assign_blocks``)
routes the whole dataset to its children in one dispatch. The previous
one-kmeans-per-cluster recursion compiled a fresh ``assign_dataset``
shape per distinct cluster-size bucket — tens of 10-120 s remote
compiles that dominated the 1M-row MSTG build (~20 min; now minutes).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import time

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.kmeans import (
    _block_size,
    _grouped_assign_blocks,
    _kmeans_device,
    _pad_pow2,
    DEFAULT_MAX_POINTS_PER_CENTROID,
)
from ...utils.logging import get_logger

_log = get_logger("mstg.clustering")


@dataclass
class ClusterSet:
    """Final clustering: member row indices and centroids."""

    members: list[np.ndarray]  # per-cluster row indices into the data matrix
    centroids: np.ndarray  # [C, D] f32


def hierarchical_cluster(
    data: np.ndarray,
    max_cluster_size: int,
    branching_factor: int,
    balance_weight: float = 1.0,
    kmeans_iters: int = 25,
    seed: int = 42,
    data_dev=None,
    refine_iters: int = 12,
    assign_dtype: str = "f32",
) -> ClusterSet:
    data = np.ascontiguousarray(data, np.float32)
    n = data.shape[0]
    if n == 0:
        return ClusterSet(members=[], centroids=np.zeros((0, data.shape[1]), np.float32))
    if data_dev is None:
        data_dev = jnp.asarray(data)  # uploaded once; splits gather on device

    import jax

    rng = np.random.default_rng(seed)
    # row-group plane reused every level; dataset rows padded ONCE to a
    # pow2 bucket so the grouped assignment compiles per (N_pad, C_pad)
    n_pad = _pad_pow2(n)
    if n_pad != n:
        data_pad = jnp.concatenate(
            [data_dev, jnp.zeros((n_pad - n, data.shape[1]), jnp.float32)]
        )
    else:
        data_pad = data_dev

    active: list[np.ndarray] = [np.arange(n, dtype=np.int64)]
    final: list[np.ndarray] = []
    split_round = 0
    level = 0
    while True:
        oversized = [c for c in active if c.shape[0] > max_cluster_size]
        final.extend(c for c in active if c.shape[0] <= max_cluster_size)
        if not oversized:
            break
        level += 1
        t0 = time.perf_counter()

        # --- per-cluster child centroids from fixed-size sampled subsets ---
        cents: list[np.ndarray] = []
        ks: list[int] = []
        for idx in oversized:
            split_round += 1
            m = idx.shape[0]
            # Full fan-out (reference semantics, mstg/clustering.rs): an
            # adaptive k = ceil(m/max_size) variant was measured and
            # REJECTED — it yields fewer, fuller lists (399 vs 2221 at
            # 100K/max=400) but per probed ROW the finer partition recalls
            # far better (coverage 0.76 vs 0.46 at a ~3-4% row budget,
            # tools/mstg_nav_diag.py), and on TPU probing more small lists
            # is free.
            k = min(branching_factor, m)
            target = max(min(m, k * DEFAULT_MAX_POINTS_PER_CENTROID), k)
            sel = idx[rng.permutation(m)[:target]]
            block = min(_block_size(k), _pad_pow2(target))
            nt_pad = ((target + block - 1) // block) * block
            rows_pad = np.zeros(nt_pad, np.int64)
            rows_pad[:target] = sel
            train_dev = jnp.take(data_pad, jnp.asarray(rows_pad), axis=0)
            key = jax.random.PRNGKey((seed + split_round) * 1_000_003)
            cent_dev, _ = _kmeans_device(
                train_dev, key, k, kmeans_iters, block, target, False,
                assign_dtype=assign_dtype,
            )
            cents.append(np.asarray(cent_dev))
            ks.append(k)

        # --- ONE grouped assignment dispatch for the whole level ---
        g_count = len(oversized)
        c_total = int(sum(ks))
        c_pad = _pad_pow2(c_total, floor=8)
        cent_cat = np.zeros((c_pad, data.shape[1]), np.float32)
        cent_cat[:c_total] = np.concatenate(cents)
        cent_group = np.full(c_pad, -2, np.int32)  # filler: matches no row
        cent_group[:c_total] = np.repeat(np.arange(g_count, dtype=np.int32), ks)
        row_group = np.full(n_pad, -1, np.int32)
        for gi, idx in enumerate(oversized):
            row_group[idx] = gi
        block = min(_block_size(c_pad), n_pad)
        assign = np.asarray(
            _grouped_assign_blocks(
                data_pad,
                jnp.asarray(cent_cat),
                jnp.asarray(cent_group),
                jnp.asarray(row_group),
                block,
                assign_dtype,
            )
        )[:n]

        # --- split into children + per-group host rebalance ---
        child_base = np.concatenate([[0], np.cumsum(ks)])
        next_active: list[np.ndarray] = []
        for gi, idx in enumerate(oversized):
            local = assign[idx] - child_base[gi]
            groups = [idx[local == c] for c in range(ks[gi])]
            if balance_weight > 0.0:
                groups = _rebalance(
                    data[idx], idx, groups, cents[gi], balance_weight
                )
            m = idx.shape[0]
            live = [g for g in groups if g.size]
            if len(live) <= 1 or max(g.size for g in live) == m:
                # degenerate split (all rows in one child): force an even
                # partition so the recursion terminates
                parts = max(2, (m + max_cluster_size - 1) // max_cluster_size)
                live = np.array_split(idx, parts)
            next_active.extend(g for g in live if g.size)
        active = next_active
        _log.debug(
            "level %d: %d clusters -> %d children (%.2fs)",
            level, g_count, len(active), time.perf_counter() - t0,
        )

    if refine_iters > 0 and len(final) > 1:
        final = _global_polish(
            data, data_pad, n, final, max_cluster_size, refine_iters,
            assign_dtype=assign_dtype,
        )

    centroids = np.stack([data[m].mean(axis=0) for m in final]).astype(np.float32)
    return ClusterSet(members=final, centroids=centroids)


@functools.partial(jax.jit, static_argnames=("block", "assign_dtype"))
def _polish_step(data, centroids, cent_group, row_group, block, assign_dtype="f32"):
    """One global Lloyd iteration over the LEAF centroids: grouped
    assignment (padded centroid slots carry group -2 and match no row) +
    segment-sum centroid update. Empty slots keep their old centroid (no
    reseed: the polish must not invent new lists)."""
    c_pad = centroids.shape[0]
    assign = _grouped_assign_blocks(
        data, centroids, cent_group, row_group, block, assign_dtype
    )
    seg = jnp.where(row_group == 0, assign, c_pad)  # padding rows -> scratch
    sums = jax.ops.segment_sum(data, seg, num_segments=c_pad + 1)[:c_pad]
    counts = jax.ops.segment_sum(
        jnp.ones(seg.shape, jnp.float32), seg, num_segments=c_pad + 1
    )[:c_pad]
    new_c = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centroids
    )
    return assign, new_c


def _global_polish(
    data: np.ndarray,
    data_pad,  # [N_pad, D] device copy
    n: int,
    final: list[np.ndarray],
    max_cluster_size: int,
    refine_iters: int,
    assign_dtype: str = "f32",
) -> list[np.ndarray]:
    """Global Lloyd polish of the leaf partition.

    The level-synchronous recursion assigns each row only within its
    parent's subtree, so rows near an early split boundary end up in a
    leaf far from their globally-nearest one — measured on the calibrated
    100K workload (tools/mstg_nav_diag.py) the un-polished leaves put the
    true NN's list at median centroid-rank 140 (ef=4 coverage 0.10)
    where a flat k-means partition of the same list count reaches median
    rank 0 (ef=4 coverage 0.75). GLOBAL Lloyd iterations seeded from the
    leaf centroids close that gap and pass the control (12 iters: ef=4
    coverage 0.815 — the balanced hierarchy is a better init than
    k-means++): one grouped-assignment dispatch per iteration, empty
    leaves dropped, oversized leaves evenly re-split afterwards so
    ``max_cluster_size`` still holds (the parts
    share one neighborhood, so their means rank interchangeably). The
    reference has no such pass (``mstg/clustering.rs`` stops at the
    subtree partition); this is a quality-only TPU deviation — probing
    cost on TPU depends on list-count geometry, not partition shape.
    """
    d = data.shape[1]
    c = len(final)
    cents = np.stack([data[m].mean(axis=0) for m in final]).astype(np.float32)
    c_pad = _pad_pow2(c, floor=8)
    cent = np.zeros((c_pad, d), np.float32)
    cent[:c] = cents
    cent_group = np.full(c_pad, -2, np.int32)
    cent_group[:c] = 0
    n_pad = data_pad.shape[0]
    row_group = np.zeros(n_pad, np.int32)
    row_group[n:] = -1
    block = min(_block_size(c_pad), n_pad)
    cent_dev = jnp.asarray(cent)
    cg_dev = jnp.asarray(cent_group)
    rg_dev = jnp.asarray(row_group)
    assign = None
    for _ in range(refine_iters):
        assign, cent_dev = _polish_step(
            data_pad, cent_dev, cg_dev, rg_dev, block, assign_dtype
        )
    assign = np.asarray(assign)[:n]
    order = np.argsort(assign, kind="stable")  # rows stay ascending per list
    counts = np.bincount(assign, minlength=c)
    polished: list[np.ndarray] = []
    for m in np.split(order, np.cumsum(counts)[:-1]):
        if m.size == 0:
            continue
        if m.size > max_cluster_size:
            parts = (m.size + max_cluster_size - 1) // max_cluster_size
            polished.extend(np.array_split(m, parts))
        else:
            polished.append(m)
    return polished


def _rebalance(
    sub: np.ndarray,
    idx: np.ndarray,
    groups: list[np.ndarray],
    centroids: np.ndarray,
    balance_weight: float,
) -> list[np.ndarray]:
    """Move closest vectors from oversized to undersized children
    (``mstg/clustering.rs:133-208``)."""
    total = sum(g.size for g in groups)
    k = len(groups)
    target = total // max(k, 1)
    max_allowed = int(target * (1.0 + balance_weight))
    pos_of = {int(v): i for i, v in enumerate(idx)}

    for _ in range(10):
        sizes = [g.size for g in groups]
        over = next((i for i, s in enumerate(sizes) if s > max_allowed), None)
        under = next((i for i, s in enumerate(sizes) if s < target), None)
        if over is None or under is None:
            break
        need = min(sizes[over] - max_allowed, target - sizes[under])
        need = max(need, 1)
        rows = np.array([pos_of[int(v)] for v in groups[over]])
        d2 = np.sum((sub[rows] - centroids[under][None, :]) ** 2, axis=-1)
        move = np.argsort(d2)[:need]
        moved = groups[over][move]
        keep = np.ones(groups[over].size, bool)
        keep[move] = False
        groups[over] = groups[over][keep]
        groups[under] = np.concatenate([groups[under], moved])
    return groups
