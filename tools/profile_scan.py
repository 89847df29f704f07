"""Decompose batched-search wall time: transfer vs dispatch vs device compute.

The environment's TPU sits behind a remote tunnel (~35 ms dispatch RTT,
~20-70 MB/s host<->device). This harness separates, at a given scale:

  * host->device bandwidth (timed device_put of the query block)
  * end-to-end batch_search_arrays (the BENCH number's inner loop)
  * dispatch+compute with the query ALREADY device-resident
  * device-only scan time (many reps amortize the dispatch RTT)

Usage: python tools/profile_scan.py [--rows 1000000] [--batch 2048] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_or_make_workload as make_workload  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--scan-dtype", default="bf16")
    ap.add_argument("--trace", default=None, help="jax profiler logdir")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType, SearchParams

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = make_workload(
        args.rows, args.batch, args.dim, max(args.nlist // 2, 8), rng
    )

    t0 = time.time()
    index = IvfRabitqIndex.train(
        data, nlist=args.nlist, total_bits=7, metric=Metric.L2,
        rotator_type=RotatorType.FhtKacRotator, seed=42, use_faster_config=True,
    )
    index.scan_dtype = args.scan_dtype
    log(f"build: {time.time()-t0:.1f}s")
    params = SearchParams(top_k=10, nprobe=args.nprobe)

    # 1) raw host->device bandwidth on the query block
    qbytes = queries.nbytes
    jax.device_put(queries).block_until_ready()  # warm path
    t0 = time.time()
    for _ in range(3):
        jax.device_put(queries).block_until_ready()
    put_s = (time.time() - t0) / 3
    log(f"device_put {qbytes/1e6:.1f} MB: {put_s*1000:.1f} ms "
        f"({qbytes/put_s/1e6:.1f} MB/s)")

    # 2) end-to-end (host numpy in, numpy out) — matches bench.py
    index.batch_search_arrays(queries, params)  # compile
    t0 = time.time()
    for _ in range(args.reps):
        index.batch_search_arrays(queries, params)
    e2e_s = (time.time() - t0) / args.reps
    log(f"end-to-end batch ({args.batch}): {e2e_s*1000:.1f} ms "
        f"({args.batch/e2e_s:.0f} QPS)")

    # 3) query device-resident: isolates upload cost from dispatch+compute
    dev, packed, row_allowed = index._scan_inputs(None)
    b_pad = 1 << (args.batch - 1).bit_length()
    q_host = np.zeros((b_pad, args.dim), np.float32)
    q_host[: args.batch] = queries
    q_dev = jax.device_put(q_host)
    q_dev.block_until_ready()
    max_tiles = index._fused_max_tiles(params.nprobe, batch=b_pad)
    log(f"max_tiles (probed-tile compaction budget): {max_tiles}")

    def run(q):
        ids, dists = index._fused_scan(
            q, dev.centroids, dev.binary, dev.ex, dev.f_add, dev.f_rescale,
            dev.f_error, dev.f_add_ex, dev.f_rescale_ex, dev.cluster_of,
            row_allowed, dev.ids,
            packed=packed, fused_cblk=index._fused_cblk,
            top_k=10, nprobe=params.nprobe, rerank=params.resolved_rerank(),
            metric=index.metric, ex_bits=index.ex_bits,
            scan_dtype=index.scan_dtype, approx_topk=index.approx_topk,
            max_tiles=max_tiles,
        )
        return ids, dists

    jax.block_until_ready(run(q_dev))
    t0 = time.time()
    for _ in range(args.reps):
        jax.block_until_ready(run(q_dev))
    dev_in_s = (time.time() - t0) / args.reps
    log(f"device-resident q (blocked per call): {dev_in_s*1000:.1f} ms "
        f"({args.batch/dev_in_s:.0f} QPS)")

    # 4) device-only: enqueue many, block once — amortizes the dispatch RTT
    t0 = time.time()
    outs = [run(q_dev) for _ in range(args.reps)]
    jax.block_until_ready(outs)
    dev_only_s = (time.time() - t0) / args.reps
    log(f"pipelined device-resident ({args.reps} in flight): "
        f"{dev_only_s*1000:.1f} ms ({args.batch/dev_only_s:.0f} QPS)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(run(q_dev))
        log(f"trace written to {args.trace}")

    print(
        {
            "put_ms": round(put_s * 1000, 1),
            "e2e_ms": round(e2e_s * 1000, 1),
            "device_resident_ms": round(dev_in_s * 1000, 1),
            "pipelined_ms": round(dev_only_s * 1000, 1),
            "upload_share": round((e2e_s - dev_in_s) / e2e_s, 3),
        }
    )


if __name__ == "__main__":
    main()
