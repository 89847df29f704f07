"""Gather-scan vs fused bin-scan at the 1M headline point, one session.

Measures, in ONE process against the saved 1M index:
  * full-program deep-rep ms/dispatch for the gather scan and the fused
    bin-scan (RABITQ_GATHER toggled per dispatch via the budget cache)
  * recall@10 of both against the cached groundtruth
  * pipelined + steady-state QPS of the better path

Usage: python tools/gather_probe.py [--blocks 256,512] [--nprobe 4]
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
    ap.add_argument("--blocks", default="256,512")
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
    params = SearchParams(top_k=args.top_k, nprobe=args.nprobe)
    budget = index._gather_budget(args.nprobe)
    sizes = np.diff(index._offsets)
    log(
        f"gather budget={budget} (4 largest clusters sum "
        f"{np.sort(sizes)[::-1][:args.nprobe].sum()}, mean {sizes.mean():.0f})"
    )
    results = {"gather_budget": budget}

    def full_ms(bs, label):
        dev, packed, row_allowed = index._scan_inputs(None)
        one = jax.device_put(index._pad_queries(queries[:bs], bs))
        jax.block_until_ready(one)
        t0 = time.time()
        jax.device_get(index._dispatch_scan(one, params, dev, packed, row_allowed))
        log(f"{label} b={bs}: warm-up (compile) {time.time()-t0:.1f}s")
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
        log(f"{label} b={bs}: {best*1e3:.3f} ms/dispatch (depth {args.depth})")
        return round(best * 1e3, 3)

    def serve(bs, label):
        ids, _ = index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
        rec = recall_at_k(ids, gt)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
            best = min(best, time.time() - t0)
        piped = args.queries / best
        # steady state: 3 waves, one final fetch
        dev, packed, row_allowed = index._scan_inputs(None)
        best = float("inf")
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
            best = min(best, (time.time() - t0) / 3)
        steady = args.queries / best
        log(
            f"{label} b={bs}: recall {rec:.4f} pipelined {piped:.0f} QPS "
            f"steady {steady:.0f} QPS"
        )
        return {
            "recall": round(rec, 4),
            "pipelined_qps": round(piped, 1),
            "steady_qps": round(steady, 1),
        }

    blocks = [int(b) for b in args.blocks.split(",")]
    for bs in blocks:
        if budget is not None:
            results[f"gather_b{bs}_full_ms"] = full_ms(bs, "gather")
        # fused for comparison: poison the budget cache to decline
        index._gather_cache = {
            (id(index._offsets), args.nprobe): None
        }
        results[f"fused_b{bs}_full_ms"] = full_ms(bs, "fused")
        index._gather_cache = {}

    for bs in blocks:
        if budget is not None:
            results[f"gather_b{bs}"] = serve(bs, "gather")
        index._gather_cache = {
            (id(index._offsets), args.nprobe): None
        }
        results[f"fused_b{bs}"] = serve(bs, "fused")
        index._gather_cache = {}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
