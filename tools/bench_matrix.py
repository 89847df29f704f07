"""Scan-dtype x upload-mode benchmark matrix on the real TPU.

Measures batched QPS at a fixed operating point for:
  scan_dtype in {bf16, fused} x {plain f32 upload, pipelined bf16 upload}
plus single-query latency for the best scan_dtype. This is the evidence
base for bench.py's default configuration.

    python tools/bench_matrix.py [--rows 1000000] [--dim 960] [--nlist 4096]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--pipeline-block", type=int, default=512)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from rabitq_tpu import IvfRabitqIndex, Metric, SearchParams

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = make_workload(
        args.rows, args.queries, args.dim, max(args.nlist // 2, 8), rng
    )
    gt = np.asarray(exact_groundtruth(data, queries, 10))

    t0 = time.time()
    index = IvfRabitqIndex.train(
        data, nlist=args.nlist, total_bits=7, metric=Metric.L2, seed=42,
        use_faster_config=True,
    )
    log(f"build: {time.time()-t0:.1f}s")
    params = SearchParams(top_k=10, nprobe=args.nprobe)
    out = {}

    for dtype in ("bf16", "fused"):
        index.scan_dtype = dtype
        index.upload_dtype = "f32"
        t0 = time.time()
        ids, _ = index.batch_search_arrays(queries[: args.batch], params)
        log(f"{dtype}: compile+first {time.time()-t0:.1f}s")
        rec = recall_at_k(ids, gt[: args.batch])
        t0 = time.time()
        for _ in range(args.reps):
            for s in range(0, args.queries, args.batch):
                index.batch_search_arrays(queries[s : s + args.batch], params)
        qps = args.queries / ((time.time() - t0) / args.reps)
        out[f"{dtype}_plain"] = {"recall": round(rec, 4), "qps": round(qps, 1)}
        log(f"{dtype} plain: recall={rec:.4f} QPS={qps:.1f}")

        index.upload_dtype = "bf16"
        ids, _ = index.batch_search_arrays_pipelined(
            queries, params, batch_size=args.pipeline_block
        )
        rec = recall_at_k(ids, gt)
        t0 = time.time()
        for _ in range(args.reps):
            index.batch_search_arrays_pipelined(
                queries, params, batch_size=args.pipeline_block
            )
        qps = args.queries / ((time.time() - t0) / args.reps)
        out[f"{dtype}_pipelined_bf16up"] = {"recall": round(rec, 4), "qps": round(qps, 1)}
        log(f"{dtype} pipelined+bf16up: recall={rec:.4f} QPS={qps:.1f}")

    # single-query latency on the fused path
    index.scan_dtype = "fused"
    index.upload_dtype = "f32"
    index.batch_search_arrays(queries[:1], params)
    t0 = time.time()
    for i in range(16):
        index.batch_search_arrays(queries[i : i + 1], params)
    out["fused_single_query_ms"] = round((time.time() - t0) / 16 * 1000, 1)
    log(f"fused single-query: {out['fused_single_query_ms']} ms")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
