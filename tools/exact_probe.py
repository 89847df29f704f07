"""Fused-EXACT scan vs two-stage fused scan at the 1M headline point.

One session, one process: trivial dispatch floor (session-speed
normalizer), then per mode (exact / two-stage with the take_rows
bitcast) full-program ms at depth 32, recall@10, pipelined and
steady-state QPS. RABITQ_FUSED_EXACT toggles per dispatch (read each
call; the jit cache keys on the static flag).

Usage: python tools/exact_probe.py [--blocks 256,512] [--nprobe 4]
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

    filler = jax.device_put(rng.standard_normal((256, 960), dtype=np.float32))
    filler.block_until_ready()

    @jax.jit
    def trivial(x):
        return jnp.sum(x, axis=1)[:8]

    jax.device_get(trivial(filler))
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        jax.device_get([trivial(filler) for _ in range(32)])
        best = min(best, (time.time() - t0) / 32)
    results["floor_d32_ms"] = round(best * 1e3, 3)
    log(f"trivial floor depth 32: {best*1e3:.3f} ms/dispatch")

    def measure(mode, bs):
        os.environ["RABITQ_FUSED_EXACT"] = "1" if mode == "exact" else "0"
        dev, packed, row_allowed = index._scan_inputs(None)
        one = jax.device_put(index._pad_queries(queries[:bs], bs))
        jax.block_until_ready(one)
        t0 = time.time()
        jax.device_get(index._dispatch_scan(one, params, dev, packed, row_allowed))
        log(f"{mode} b={bs}: warm-up (compile) {time.time()-t0:.1f}s")
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
        pbest = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
            pbest = min(pbest, time.time() - t0)
        piped = args.queries / pbest
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
            f"{mode} b={bs}: {full_ms:.3f} ms/dispatch recall {rec:.4f} "
            f"pipelined {piped:.0f} steady {steady:.0f} QPS"
        )
        return {
            "full_ms": round(full_ms, 3),
            "recall": round(rec, 4),
            "pipelined_qps": round(piped, 1),
            "steady_qps": round(steady, 1),
        }

    for bs in [int(b) for b in args.blocks.split(",")]:
        for mode in ("exact", "twostage"):
            results[f"{mode}_b{bs}"] = measure(mode, bs)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
