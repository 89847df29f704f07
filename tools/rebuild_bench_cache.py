"""Rebuild bench.py's on-disk caches after a worker reset wipes data/.

Worker machines can be re-imaged between sessions, losing
``data/bench_cache`` (the 1M x 960 calibrated workload + exact
groundtruth) and ``data/jax_cache`` (compiled executables). Without the
caches a bench run spends ~25 min of single-core numpy regenerating the
workload and ~3 min of TPU time on groundtruth before measuring anything.

This script regenerates exactly what ``bench.py`` (default args) will
look for:

  1. workload: ``bench.load_or_make_workload(rows, queries, dim,
     nlist//2, rng(7))`` -> data/bench_cache/*.npy  (CPU, ~4-25 min)
  2. groundtruth: ``bench.exact_groundtruth`` on the TPU, saved under
     bench.py's sha1 cache key  (one TPU client, ~3 min)

Run it early in a session (background it); wait ~60-90 s after it exits
before starting another TPU client (CLAUDE.md tunnel cooldown).

Usage: python tools/rebuild_bench_cache.py [--rows 1000000] [--dim 960]
       [--nlist 4096] [--queries 2048] [--top-k 10] [--skip-gt]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--skip-gt", action="store_true",
                    help="workload only (no TPU client)")
    args = ap.parse_args()

    from bench import exact_groundtruth, gt_cache_paths, load_or_make_workload

    rng = np.random.default_rng(7)  # bench.py's seed
    t0 = time.time()
    data, queries = load_or_make_workload(
        args.rows, args.queries, args.dim, max(args.nlist // 2, 8), rng
    )
    print(f"workload ready: {data.shape} ({time.time()-t0:.1f}s)", flush=True)

    if args.skip_gt:
        return
    # key/path construction shared with bench.py (cannot drift)
    path, tmp_path = gt_cache_paths(
        args.rows, args.dim, args.nlist, args.queries, args.top_k
    )
    if os.path.exists(path):
        print(f"groundtruth already cached: {path}")
        return
    if os.path.exists(tmp_path):
        # a pre-existing /tmp cache (bench.py's fallback write location)
        # saves the ~3 min TPU recompute: promote it to data/
        gt = np.load(tmp_path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, gt)
        print(f"groundtruth promoted from {tmp_path} -> {path}")
        return
    # re-warm data/jax_cache for the groundtruth programs too (bench.py
    # enables the same persistent compile cache)
    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.time()
    gt = exact_groundtruth(data, queries, args.top_k)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.save(path, gt)
    print(f"groundtruth cached: {path} {gt.shape} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
