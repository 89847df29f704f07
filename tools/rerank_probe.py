"""Survivor-budget (rerank) sweep at the 1M headline point.

The stage-2 survivor gather dominates the fused serving dispatch
(~9.5 of 14 ms at rerank=400 before the take_rows int32-bitcast fix);
its cost is linear in the budget. This probe measures full-program
ms/dispatch, recall@10 and steady QPS per rerank value in one session —
both to quantify the bitcast win and to find the smallest budget that
holds the recall target.

Usage: python tools/rerank_probe.py [--reranks 400,200,100,50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_or_make_workload, load_or_make_groundtruth, recall_at_k  # noqa: E402


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
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--reranks", default="400,200,100,50")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--scan-dtype", default="fused8")
    ap.add_argument(
        "--index-path",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "probe_1m.rbq",
        ),
    )
    args = ap.parse_args()

    import jax

    from rabitq_tpu import IvfRabitqIndex, SearchParams
    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = load_or_make_workload(
        args.rows, args.queries, args.dim, max(args.nlist // 2, 8), rng
    )
    t0 = time.time()
    index = IvfRabitqIndex.load_from_path(args.index_path)
    index.scan_dtype = args.scan_dtype
    index.upload_dtype = "int8"
    log(f"load: {time.time()-t0:.1f}s")
    gt = load_or_make_groundtruth(
        data, queries, args.rows, args.dim, args.nlist, args.top_k
    )
    bs = args.block
    results = {}
    for rr in [int(r) for r in args.reranks.split(",")]:
        params = SearchParams(top_k=args.top_k, nprobe=args.nprobe, rerank=rr)
        dev, packed, row_allowed = index._scan_inputs(None)
        one = jax.device_put(index._pad_queries(queries[:bs], bs))
        jax.block_until_ready(one)
        t0 = time.time()
        jax.device_get(index._dispatch_scan(one, params, dev, packed, row_allowed))
        log(f"rerank={rr}: warm-up (compile) {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            jax.device_get(
                [
                    index._dispatch_scan(one, params, dev, packed, row_allowed)
                    for _ in range(args.depth)
                ]
            )
            best = min(best, (time.time() - t0) / args.depth)
        full_ms = best * 1e3
        ids, _ = index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
        rec = recall_at_k(ids, gt)
        sbest = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            pending = []
            for _w in range(3):
                for s in range(0, args.queries, bs):
                    cur = jax.device_put(index._pad_queries(queries[s : s + bs], bs))
                    pending.append(
                        index._dispatch_scan(cur, params, dev, packed, row_allowed)
                    )
            jax.device_get(pending)
            sbest = min(sbest, (time.time() - t0) / 3)
        steady = args.queries / sbest
        log(
            f"rerank={rr}: {full_ms:.3f} ms/dispatch recall {rec:.4f} "
            f"steady {steady:.0f} QPS"
        )
        results[f"r{rr}"] = {
            "full_ms": round(full_ms, 3),
            "recall": round(rec, 4),
            "steady_qps": round(steady, 1),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
