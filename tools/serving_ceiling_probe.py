"""One-process serving-ceiling decomposition at the 1M headline point.

Cross-script comparisons keep disagreeing (the tunnel's bandwidth and
service time swing between sessions), so this probe measures EVERYTHING
in one process against the saved 1M index:

  1. trivial-program dispatch floor at depth 8/32 (service + RTT share)
  2. full scan program, deep-rep timing (compute + service + RTT/reps)
  3. dispatch-only serving at depth 8/16/32 (pre-put blocks)
  4. pipelined serving (the product metric) at b=256/512
  5. pipelined serving of 3 consecutive 2048-query waves with one final
     fetch (steady-state: RTT amortized over the whole stream)

Usage: python tools/serving_ceiling_probe.py [--blocks 256,512]
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
    import jax.numpy as jnp

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
    results = {}

    # --- 1. trivial dispatch floor ---
    filler = jax.device_put(rng.standard_normal((256, 960), dtype=np.float32))
    filler.block_until_ready()

    @jax.jit
    def trivial(x):
        return jnp.sum(x, axis=1)[:8]

    jax.device_get(trivial(filler))
    for depth in (8, 32):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            jax.device_get([trivial(filler) for _ in range(depth)])
            best = min(best, (time.time() - t0) / depth)
        results[f"floor_d{depth}_ms"] = round(best * 1e3, 3)
        log(f"trivial floor depth {depth}: {best*1e3:.3f} ms/dispatch")

    for bs in [int(b) for b in args.blocks.split(",")]:
        dev, packed, row_allowed = index._scan_inputs(None)
        blocks = [
            jax.device_put(index._pad_queries(queries[s : s + bs], bs))
            for s in range(0, args.queries, bs)
        ]
        jax.block_until_ready(blocks)
        one = blocks[0]

        # warm-up compile
        ids0, _ = jax.device_get(
            index._dispatch_scan(one, params, dev, packed, row_allowed)
        )

        # --- 2. full-program compute, deep reps on ONE block ---
        for depth in (32,):
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                jax.device_get(
                    [
                        index._dispatch_scan(one, params, dev, packed, row_allowed)
                        for _ in range(depth)
                    ]
                )
                best = min(best, (time.time() - t0) / depth)
            results[f"b{bs}_full_d{depth}_ms"] = round(best * 1e3, 3)
            log(f"b={bs} full program depth {depth}: {best*1e3:.3f} ms/dispatch")

        # --- 3. dispatch-only over distinct blocks (depth = nblocks) ---
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            jax.device_get(
                [
                    index._dispatch_scan(b, params, dev, packed, row_allowed)
                    for b in blocks
                ]
            )
            best = min(best, time.time() - t0)
        results[f"b{bs}_dispatch_only_qps"] = round(args.queries / best, 1)
        log(
            f"b={bs} dispatch-only depth {len(blocks)}: "
            f"{best/len(blocks)*1e3:.2f} ms/block  {args.queries/best:.0f} QPS"
        )

        # --- 4. pipelined serving (product metric) ---
        ids, _ = index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
        rec = recall_at_k(ids, gt)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
            best = min(best, time.time() - t0)
        results[f"b{bs}_pipelined_qps"] = round(args.queries / best, 1)
        results[f"b{bs}_recall"] = round(rec, 4)
        log(f"b={bs} pipelined: {args.queries/best:.0f} QPS recall {rec:.4f}")

        # --- 5. steady state: 3 waves, one final fetch ---
        waves = 3
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            pending = []
            for _w in range(waves):
                for s in range(0, args.queries, bs):
                    cur = jax.device_put(
                        index._pad_queries(queries[s : s + bs], bs)
                    )
                    pending.append(
                        index._dispatch_scan(cur, params, dev, packed, row_allowed)
                    )
            jax.device_get(pending)
            best = min(best, (time.time() - t0) / waves)
        results[f"b{bs}_steady_qps"] = round(args.queries / best, 1)
        log(f"b={bs} steady (3 waves, 1 fetch): {args.queries/best:.0f} QPS")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
