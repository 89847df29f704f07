"""Measure upload_block (put granularity) x batch_size (dispatch size).

tools/upload_experiment.py established the end-to-end pipelined block is
dominated by the tunnel, and that SMALL per-put transfers see far less
than the raw (10 MB-probe) bandwidth. This probe separates the two fixed
costs the serving loop pays per block — the device_put and the dispatch —
by decoupling them: queries upload in superblocks of ``upload_block``
rows (one put each), scans still dispatch per ``batch_size`` window
(device-side dynamic_slice at a traced offset; see
``IvfRabitqIndex.batch_search_arrays_pipelined``).

If per-put overhead dominates, QPS rises with upload_block at fixed
batch_size; if per-dispatch overhead dominates, it stays flat.

Usage: python tools/superblock_experiment.py [--rows 1000000] [--nprobe 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_or_make_workload, exact_groundtruth, recall_at_k  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan-dtype", default="fused8")
    ap.add_argument("--upload-dtype", default="int8")
    args = ap.parse_args()

    import jax

    from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType, SearchParams
    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = load_or_make_workload(
        args.rows, args.queries, args.dim, max(args.nlist // 2, 8), rng
    )

    # raw tunnel bandwidth for context (10 MB block, 3 reps)
    blob = np.zeros((10 * 1024 * 1024 // 4,), np.float32)
    jax.device_put(blob).block_until_ready()
    t0 = time.time()
    for _ in range(3):
        jax.device_put(blob).block_until_ready()
    bw = blob.nbytes * 3 / (time.time() - t0) / 1e6
    log(f"tunnel upload bandwidth: {bw:.1f} MB/s")

    t0 = time.time()
    index = IvfRabitqIndex.train(
        data, nlist=args.nlist, total_bits=7, metric=Metric.L2,
        rotator_type=RotatorType.FhtKacRotator, seed=42,
        use_faster_config=True, scan_dtype=args.scan_dtype,
    )
    index.device
    log(f"build: {time.time()-t0:.1f}s")

    gt = exact_groundtruth(data, queries, args.top_k)
    params = SearchParams(top_k=args.top_k, nprobe=args.nprobe)
    index.upload_dtype = args.upload_dtype

    results = {"bandwidth_mb_s": round(bw, 1)}
    grid = [
        (256, None),  # today's default: put == dispatch
        (256, 1024),
        (256, 2048),
    ]
    for block, ub in grid:
        kw = dict(batch_size=block, upload_block=ub)
        ids, _ = index.batch_search_arrays_pipelined(queries, params, **kw)
        rec = recall_at_k(ids, gt)
        t0 = time.time()
        for _ in range(args.reps):
            index.batch_search_arrays_pipelined(queries, params, **kw)
        qps = args.queries / ((time.time() - t0) / args.reps)
        name = f"b{block}_ub{ub or block}"
        log(f"{name:>14}: recall={rec:.4f} QPS={qps:.1f}")
        results[name] = {"recall": round(rec, 4), "qps": round(qps, 1)}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
