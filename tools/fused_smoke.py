"""Real-TPU smoke + micro-benchmark for scan_dtype='fused'.

Small scale by default (fast compile): checks the Mosaic lowering of the
fused kernel (scalar-prefetch window index maps, dynamic-offset bin
stores), verifies recall parity vs the dense bf16 path, and times both.

    python tools/fused_smoke.py [--rows 200000] [--dim 960] [--nlist 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import exact_groundtruth, load_or_make_workload as make_workload, recall_at_k  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from rabitq_tpu import IvfRabitqIndex, Metric, SearchParams

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = make_workload(
        args.rows, args.batch, args.dim, max(args.nlist // 2, 8), rng
    )
    gt = np.asarray(exact_groundtruth(data, queries, 10))

    t0 = time.time()
    index = IvfRabitqIndex.train(
        data, nlist=args.nlist, total_bits=7, metric=Metric.L2, seed=42,
        use_faster_config=True,
    )
    log(f"build: {time.time()-t0:.1f}s")
    params = SearchParams(top_k=10, nprobe=args.nprobe)

    for dtype in ("bf16", "fused"):
        index.scan_dtype = dtype
        t0 = time.time()
        ids, _ = index.batch_search_arrays(queries, params)  # compile
        log(f"{dtype}: first call (compile) {time.time()-t0:.1f}s")
        rec = recall_at_k(ids, gt)
        t0 = time.time()
        for _ in range(args.reps):
            index.batch_search_arrays(queries, params)
        dt = (time.time() - t0) / args.reps
        log(
            f"{dtype}: recall@10={rec:.4f} {args.batch/dt:.0f} QPS "
            f"({dt*1000:.1f} ms/batch)"
        )


if __name__ == "__main__":
    main()
