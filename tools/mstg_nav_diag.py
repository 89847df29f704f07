"""Diagnose MSTG navigation quality: where does the true NN's posting
list rank in the exact centroid ordering?

The 1M bench shows MSTG recall rising roughly with probed fraction
(ef=64/1117 lists -> 0.41, ef=1024 -> 0.967) while IVF probing 4/4096
lists reaches 0.973. Navigation is an exact centroid matmul here, so if
top-ef centroids don't cover the true neighbors the partition itself is
to blame. This probe isolates that: hierarchical clustering + closure
only (no quantization), NN-list centroid-rank distribution, with a plain
k-means partition of the same list count as the control.

Usage: python tools/mstg_nav_diag.py [--rows 100000] [--dim 256]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

# CPU-only probe (clustering + numpy ranking): never claim the TPU tunnel
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_or_make_workload as make_workload  # noqa: E402


def nn_list_rank(data, queries, members, cents, gt_ids):
    """[Q, k] best centroid-rank over the lists containing each true NN."""
    n_lists = cents.shape[0]
    row_lists: dict[int, list[int]] = {}
    for li, m in enumerate(members):
        for r in m.tolist():
            row_lists.setdefault(r, []).append(li)
    qn = (queries**2).sum(1, keepdims=True)
    cd = qn - 2 * queries @ cents.T + (cents**2).sum(1)
    order = np.argsort(cd, axis=1)
    rank_of = np.empty_like(order)
    np.put_along_axis(
        rank_of, order, np.broadcast_to(np.arange(n_lists), order.shape), 1
    )
    best = np.full(gt_ids.shape, n_lists, np.int64)
    for qi in range(gt_ids.shape[0]):
        for j, nn in enumerate(gt_ids[qi]):
            for li in row_lists.get(int(nn), ()):
                best[qi, j] = min(best[qi, j], rank_of[qi, li])
    return best


def report(label, best_rank, n_lists):
    med = np.median(best_rank)
    p90 = np.percentile(best_rank, 90)
    print(f"[{label}] NN-list rank: med={med:.0f} p90={p90:.0f} (of {n_lists})")
    for ef in (4, 8, 16, 32, 64, 128, 256):
        if ef > n_lists:
            break
        print(f"  ef={ef:4d}: true-NN coverage = {(best_rank < ef).mean():.4f}")


def topk(data, queries, k):
    dn = (data**2).sum(1)
    out = np.empty((queries.shape[0], k), np.int64)
    for s in range(0, queries.shape[0], 128):
        q = queries[s : s + 128]
        d = (q**2).sum(1, keepdims=True) - 2 * q @ data.T + dn
        part = np.argpartition(d, k, axis=1)[:, :k]
        row = np.take_along_axis(d, part, axis=1)
        out[s : s + 128] = np.take_along_axis(
            part, np.argsort(row, axis=1), axis=1
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--max-posting", type=int, default=None)
    ap.add_argument("--branching", type=int, default=16)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--closure-eps", type=float, default=0.2)
    ap.add_argument("--refine-iters", type=int, default=4)
    args = ap.parse_args()

    from rabitq_tpu.index.mstg.clustering import hierarchical_cluster
    from rabitq_tpu.index.mstg.closure import closure_assign
    from rabitq_tpu.ops.kmeans import run_kmeans

    rng = np.random.default_rng(7)
    data, queries = make_workload(
        args.rows, args.queries, args.dim, max(2048, 8), rng
    )
    max_posting = args.max_posting or max(args.rows // 250, 64)
    gt_ids = topk(data, queries, args.top_k)

    print(f"clustering {args.rows}x{args.dim} max_posting={max_posting} ...",
          flush=True)
    cs = hierarchical_cluster(
        data,
        max_cluster_size=max_posting,
        branching_factor=args.branching,
        refine_iters=args.refine_iters,
    )
    n_lists = len(cs.members)
    sizes = np.array([m.size for m in cs.members])
    print(f"lists={n_lists} sizes min/med/max={sizes.min()}/"
          f"{int(np.median(sizes))}/{sizes.max()}")

    # 1) clustering partition with its own centroids
    report(
        "hier partition, clustering centroids",
        nn_list_rank(data, queries, cs.members, cs.centroids, gt_ids),
        n_lists,
    )
    # 2) post-closure membership with stored list means
    members = closure_assign(
        data, cs.centroids, epsilon=args.closure_eps, max_replicas=8
    )
    repl = sum(m.size for m in members) / args.rows
    print(f"closure replication factor: {repl:.3f}")
    means = np.stack([data[m].mean(axis=0) for m in members])
    report(
        "post-closure, list means",
        nn_list_rank(data, queries, members, means, gt_ids),
        n_lists,
    )
    # 3) control: flat k-means partition at the same list count
    print(f"k-means control ({n_lists} lists) ...", flush=True)
    km = run_kmeans(data, n_lists, niter=10, seed=3)
    cents = np.asarray(km.centroids, np.float32)
    assign = np.empty(args.rows, np.int64)
    for s in range(0, args.rows, 8192):
        blk = data[s : s + 8192]
        d = (
            (blk**2).sum(1, keepdims=True)
            - 2 * blk @ cents.T
            + (cents**2).sum(1)
        )
        assign[s : s + 8192] = d.argmin(1)
    km_members = [np.nonzero(assign == i)[0] for i in range(n_lists)]
    report(
        "flat k-means, same list count",
        nn_list_rank(data, queries, km_members, cents, gt_ids),
        n_lists,
    )


if __name__ == "__main__":
    main()
