"""Host-side simulation: does SPATIALLY ordering cluster ids shrink the
fused kernel's per-block probed-tile lists?

The fused kernel walks, per TB=128-query block, the union of tiles the
block's probed clusters span (queries are pre-sorted by best centroid so
blocks share clusters). Cluster IDs today are arbitrary k-means output
order, so even a tight union of SIMILAR clusters scatters across the
whole row space — per-block tile counts sit near the expected
``u * mean_span`` bound with u ~ TB*nprobe.

If cluster ids were renumbered so that nearby centroids get nearby ids
(and rows re-sorted to match), a block of similar queries would probe a
CONTIGUOUS band of tiles: the union collapses both because probe sets
overlap (same clusters) and because neighboring clusters share tiles.

This tool measures actual per-block tile counts on the real 1M index +
cached bench queries (CPU only — forces jax_platforms=cpu before any
device work) under:
  a) current order (k-means output)
  b) recursive spatial order (balanced k-means bisection of centroids)

Usage: python tools/cluster_order_sim.py [--index data/probe_1m.rbq]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def spatial_order(centroids: np.ndarray, leaf: int = 8, seed: int = 0) -> np.ndarray:
    """Recursive balanced 2-means bisection: returns a permutation of
    cluster ids such that consecutive ids have nearby centroids."""
    rng = np.random.default_rng(seed)

    def rec(idx: np.ndarray) -> list[int]:
        if len(idx) <= leaf:
            return list(idx)
        c = centroids[idx]
        # 2-means, balanced split by the projection onto the center line
        a, b = c[rng.integers(len(idx))], c[rng.integers(len(idx))]
        for _ in range(8):
            da = ((c - a) ** 2).sum(1)
            db = ((c - b) ** 2).sum(1)
            mask = da <= db
            if mask.sum() in (0, len(idx)):
                break
            a, b = c[mask].mean(0), c[~mask].mean(0)
        proj = c @ (b - a)
        order = np.argsort(proj, kind="stable")
        half = len(idx) // 2
        return rec(idx[order[:half]]) + rec(idx[order[half:]])

    return np.asarray(rec(np.arange(len(centroids))), np.int64)


def block_tile_stats(
    probes: np.ndarray,  # [Q, nprobe] cluster ids (current numbering)
    sizes: np.ndarray,  # [C] cluster sizes (current numbering)
    order: np.ndarray,  # [C] permutation: device position -> cluster id
    tb: int = 128,
    tn: int = 512,
):
    """Per-block probed-tile counts when rows are laid out in ``order``
    and queries are sorted by their best cluster's DEVICE position."""
    c = len(sizes)
    pos_of = np.empty(c, np.int64)
    pos_of[order] = np.arange(c)
    sizes_dev = sizes[order]
    off = np.zeros(c + 1, np.int64)
    np.cumsum(sizes_dev, out=off[1:])
    n_pad = ((off[-1] + tn - 1) // tn) * tn
    lo_tile = off[:-1] // tn  # first tile of device-cluster i
    hi_tile = (np.maximum(off[1:], off[:-1] + 1) - 1) // tn

    probes_dev = pos_of[probes]  # [Q, nprobe] device positions
    qorder = np.argsort(probes_dev[:, 0], kind="stable")
    probes_dev = probes_dev[qorder]

    counts = []
    for s in range(0, len(probes_dev), tb):
        blk = probes_dev[s : s + tb].ravel()
        tiles = set()
        for p in np.unique(blk):
            tiles.update(range(lo_tile[p], hi_tile[p] + 1))
        counts.append(len(tiles))
    counts = np.asarray(counts)
    return counts, int(n_pad // tn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default="data/probe_1m.rbq")
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--tb", type=int, default=128)
    args = ap.parse_args()

    from bench import load_or_make_workload
    from rabitq_tpu import IvfRabitqIndex

    rng = np.random.default_rng(7)
    _, queries = load_or_make_workload(1_000_000, args.queries, 960, 2048, rng)

    index = IvfRabitqIndex.load_from_path(args.index)
    h = index.host
    sizes = np.diff(h.cluster_offsets)
    cents = h.centroids  # rotated space
    q_rot = index.rotator.rotate_np(queries.astype(np.float32))
    d2 = (
        (q_rot**2).sum(1)[:, None]
        - 2 * q_rot @ cents.T
        + (cents**2).sum(1)[None, :]
    )
    probes = np.argsort(d2, axis=1)[:, : args.nprobe]

    cur, n_tiles = block_tile_stats(
        probes, sizes, np.arange(len(sizes)), tb=args.tb
    )
    sp = spatial_order(cents)
    new, _ = block_tile_stats(probes, sizes, sp, tb=args.tb)
    print(f"tiles total: {n_tiles}")
    print(
        f"current order: mean {cur.mean():7.1f}  p50 {np.percentile(cur,50):7.1f}"
        f"  max {cur.max():5d}"
    )
    print(
        f"spatial order: mean {new.mean():7.1f}  p50 {np.percentile(new,50):7.1f}"
        f"  max {new.max():5d}"
    )
    print(f"mean reduction: {cur.mean()/max(new.mean(),1e-9):.2f}x")


if __name__ == "__main__":
    main()
