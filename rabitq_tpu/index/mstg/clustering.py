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
"""

from __future__ import annotations

from dataclasses import dataclass

import time

import numpy as np

import jax.numpy as jnp

from ...ops.kmeans import run_kmeans
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
) -> ClusterSet:
    data = np.ascontiguousarray(data, np.float32)
    n = data.shape[0]
    if n == 0:
        return ClusterSet(members=[], centroids=np.zeros((0, data.shape[1]), np.float32))
    if data_dev is None:
        data_dev = jnp.asarray(data)  # uploaded once; splits gather on device

    active: list[np.ndarray] = [np.arange(n, dtype=np.int64)]
    final: list[np.ndarray] = []
    split_round = 0
    while active:
        idx = active.pop()
        if idx.shape[0] <= max_cluster_size:
            final.append(idx)
            continue
        split_round += 1
        sub = data[idx]
        k = min(branching_factor, sub.shape[0])
        # pow2-bucketed gather + n_valid masking: behind a remote-compile
        # tunnel each distinct shape costs a fresh compile, and the split
        # recursion produces hundreds of distinct cluster sizes
        m = idx.shape[0]
        m_pad = 1 << max(8, (m - 1).bit_length())
        idx_pad = np.zeros(m_pad, np.int64)
        idx_pad[:m] = idx
        t0 = time.perf_counter()
        sub_dev = jnp.take(data_dev, jnp.asarray(idx_pad), axis=0)
        km = run_kmeans(
            sub, k, niter=kmeans_iters, seed=seed + split_round,
            data_dev=sub_dev, n_valid=m,
        )
        _log.debug(
            "split %d: %d rows -> %d children (%.2fs)",
            split_round, m, k, time.perf_counter() - t0,
        )
        groups = [idx[km.assignments == c] for c in range(k)]
        if balance_weight > 0.0:
            groups = _rebalance(sub, idx, groups, km.centroids, balance_weight)
        for g in groups:
            if g.size:
                active.append(g)

    centroids = np.stack([data[m].mean(axis=0) for m in final]).astype(np.float32)
    return ClusterSet(members=final, centroids=centroids)


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
