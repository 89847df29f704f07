"""Measure upload-encoding x pipeline-block QPS at the headline point.

The stage-2 microbenchmark (tools/stage2_micro.py) showed the device
batch at the 1M headline operating point is ~11 ms (prep 3.8 +
fused select 6.2 + re-rank ~0.3), while the end-to-end pipelined block
is ~68 ms — the gap is the tunnel: per-block query upload at the
session's host->device bandwidth plus dispatch RTT. This probe measures
the actual levers: upload encoding (bf16 = 2 B/dim vs int8 = 1 B/dim)
and pipeline block size, with a raw bandwidth measurement for context.

Usage: python tools/upload_experiment.py [--rows 1000000] [--nprobe 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_or_make_workload as make_workload, exact_groundtruth, recall_at_k  # noqa: E402


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
    args = ap.parse_args()

    import jax

    from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType, SearchParams

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = make_workload(
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

    results = {"bandwidth_mb_s": round(bw, 1)}
    for upload in ("bf16", "int8", "f32"):
        index.upload_dtype = upload
        for block in (256, 512, 1024):
            ids, _ = index.batch_search_arrays_pipelined(
                queries, params, batch_size=block
            )  # warm-up compiles the block shape
            rec = recall_at_k(ids, gt)
            t0 = time.time()
            for _ in range(args.reps):
                index.batch_search_arrays_pipelined(
                    queries, params, batch_size=block
                )
            qps = args.queries / ((time.time() - t0) / args.reps)
            log(
                f"upload={upload:>4} block={block:4d}: "
                f"recall={rec:.4f} QPS={qps:.1f}"
            )
            results[f"{upload}_b{block}"] = {
                "recall": round(rec, 4), "qps": round(qps, 1)
            }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
