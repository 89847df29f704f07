"""Block-size scaling of the per-dispatch tunnel cost, one session.

tools/tunnel_probe.py measured (fast session): puts are ~free (240 KB =
0.5 ms), dispatch enqueue is 0.32 ms, yet dispatch-only serving still
pays ~17 ms per b=256 block against ~5.5 ms of device compute — a fixed
~11-12 ms per-dispatch cost the tunnel serializes. If that is really
fixed, LARGER blocks amortize it (4 dispatches of 512 beat 8 of 256).
Cross-session history is mixed (BENCHMARKS.md block tables), so this
probe measures pipelined + dispatch-only QPS per block size in ONE
session.

The 1M index is persisted to data/probe_1m.rbq on first run and loaded
thereafter (skips the ~300-420 s rebuild; the load re-uploads ~1.1 GB of
planes at session bandwidth).

Usage: python tools/block_scaling_probe.py [--blocks 256,512,1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (  # noqa: E402
    load_or_make_workload,
    load_or_make_groundtruth,
    recall_at_k,
)


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
    ap.add_argument("--blocks", default="256,512,1024")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan-dtype", default="fused8")
    ap.add_argument(
        "--index-path",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "probe_1m.rbq",
        ),
    )
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

    t0 = time.time()
    if os.path.exists(args.index_path):
        index = IvfRabitqIndex.load_from_path(args.index_path)
        index.scan_dtype = args.scan_dtype
        log(f"load: {time.time()-t0:.1f}s")
    else:
        index = IvfRabitqIndex.train(
            data, nlist=args.nlist, total_bits=7, metric=Metric.L2,
            rotator_type=RotatorType.FhtKacRotator, seed=42,
            use_faster_config=True, scan_dtype=args.scan_dtype,
        )
        index.device
        log(f"build: {time.time()-t0:.1f}s")
        t0 = time.time()
        index.save_to_path(args.index_path)
        log(f"save: {time.time()-t0:.1f}s -> {args.index_path}")

    gt = load_or_make_groundtruth(
        data, queries, args.rows, args.dim, args.nlist, args.top_k
    )
    index.upload_dtype = "int8"
    params = SearchParams(top_k=args.top_k, nprobe=args.nprobe)
    results = {}
    for bs in [int(b) for b in args.blocks.split(",")]:
        ids, _ = index.batch_search_arrays_pipelined(
            queries, params, batch_size=bs
        )
        rec = recall_at_k(ids, gt)
        t0 = time.time()
        for _ in range(args.reps):
            index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
        piped = args.queries / ((time.time() - t0) / args.reps)

        dev, packed, row_allowed = index._scan_inputs(None)
        blocks = [
            jax.device_put(index._pad_queries(queries[s : s + bs], bs))
            for s in range(0, args.queries, bs)
        ]
        jax.block_until_ready(blocks)
        jax.device_get(
            [
                index._dispatch_scan(b, params, dev, packed, row_allowed)
                for b in blocks
            ]
        )
        t0 = time.time()
        for _ in range(args.reps):
            jax.device_get(
                [
                    index._dispatch_scan(b, params, dev, packed, row_allowed)
                    for b in blocks
                ]
            )
        disp = args.queries / ((time.time() - t0) / args.reps)
        log(
            f"b={bs:5d}: recall={rec:.4f} pipelined QPS {piped:8.1f} "
            f"dispatch-only QPS {disp:8.1f}"
        )
        results[f"b{bs}"] = {
            "recall": round(rec, 4),
            "pipelined_qps": round(piped, 1),
            "dispatch_only_qps": round(disp, 1),
        }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
