"""Decompose the serving loop's tunnel costs: per-put vs per-dispatch.

The pipelined 1M block at b=256 costs ~19 ms in a fast session while the
device computes ~5.5 ms — and the superblock experiment
(tools/superblock_experiment.py) proved batching the puts makes it
WORSE, so the overhead is not upload bytes. This probe separates the
remaining candidates in ONE session:

  * put latency by size (serial, blocked) — the fixed per-put cost
  * put throughput by size (enqueue N, block once) — how puts pipeline
  * dispatch-only serving (all query blocks pre-resident, zero puts in
    the loop) — the fixed per-dispatch cost, and the serving ceiling if
    uploads were free
  * the normal pipelined loop for the same workload — the baseline

Usage: python tools/tunnel_probe.py [--rows 1000000] [--nprobe 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_or_make_workload  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def put_probe(jax, results):
    for name, nbytes in (
        ("4B", 4),
        ("4KB", 4 << 10),
        ("240KB", 240 << 10),
        ("1MB", 1 << 20),
        ("10MB", 10 << 20),
    ):
        blob = np.zeros(nbytes, np.uint8)
        jax.device_put(blob).block_until_ready()  # warm path
        t0 = time.time()
        for _ in range(8):
            jax.device_put(blob).block_until_ready()
        serial_ms = (time.time() - t0) / 8 * 1e3
        t0 = time.time()
        pend = [jax.device_put(blob) for _ in range(8)]
        for p in pend:
            p.block_until_ready()
        piped_ms = (time.time() - t0) / 8 * 1e3
        log(f"put {name:>6}: serial {serial_ms:7.2f} ms  piped {piped_ms:7.2f} ms")
        results[f"put_{name}"] = {
            "serial_ms": round(serial_ms, 2),
            "piped_ms": round(piped_ms, 2),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan-dtype", default="fused8")
    args = ap.parse_args()

    import jax

    from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType, SearchParams
    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    results = {}
    put_probe(jax, results)

    rng = np.random.default_rng(7)
    data, queries = load_or_make_workload(
        args.rows, args.queries, args.dim, max(args.nlist // 2, 8), rng
    )
    t0 = time.time()
    index = IvfRabitqIndex.train(
        data, nlist=args.nlist, total_bits=7, metric=Metric.L2,
        rotator_type=RotatorType.FhtKacRotator, seed=42,
        use_faster_config=True, scan_dtype=args.scan_dtype,
    )
    index.device
    log(f"build: {time.time()-t0:.1f}s")
    index.upload_dtype = "int8"
    params = SearchParams(top_k=args.top_k, nprobe=args.nprobe)
    bs = args.block

    # baseline: the production pipelined loop
    index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
    t0 = time.time()
    for _ in range(args.reps):
        index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
    qps = args.queries / ((time.time() - t0) / args.reps)
    log(f"pipelined b={bs}: QPS {qps:.1f}")
    results["pipelined_qps"] = round(qps, 1)

    # dispatch-only: pre-upload every encoded block, loop dispatch + one get
    dev, packed, row_allowed = index._scan_inputs(None)
    blocks = [
        jax.device_put(index._pad_queries(queries[s : s + bs], bs))
        for s in range(0, args.queries, bs)
    ]
    jax.block_until_ready(blocks)
    pend = [
        index._dispatch_scan(b, params, dev, packed, row_allowed)
        for b in blocks
    ]
    jax.device_get(pend)  # warm
    t0 = time.time()
    for _ in range(args.reps):
        pend = [
            index._dispatch_scan(b, params, dev, packed, row_allowed)
            for b in blocks
        ]
        jax.device_get(pend)
    qps = args.queries / ((time.time() - t0) / args.reps)
    log(f"dispatch-only b={bs}: QPS {qps:.1f}")
    results["dispatch_only_qps"] = round(qps, 1)

    # enqueue cost: Python-side time to issue the dispatches (no wait)
    t0 = time.time()
    pend = [
        index._dispatch_scan(b, params, dev, packed, row_allowed)
        for b in blocks
    ]
    enq_ms = (time.time() - t0) / len(blocks) * 1e3
    jax.device_get(pend)
    log(f"dispatch enqueue: {enq_ms:.2f} ms/block")
    results["dispatch_enqueue_ms"] = round(enq_ms, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
