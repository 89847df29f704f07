"""Decompose MSTG batched-search wall time at the 1M scale.

bench.py measured MSTG at 1694 QPS (ef=1024) where the dense fused walk
of ~1.2M posting rows should cost ~150 ms/2048 queries (~14k QPS) on
device — this probe separates device compute from the host-side pieces
(query upload, result fetch + dedup) to find the gap.

Usage: python tools/mstg_profile.py [--rows 1000000] [--ef 1024]
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
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--ef", type=int, default=1024)
    ap.add_argument("--eps", type=float, default=0.6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan-dtype", default="fused8")
    args = ap.parse_args()

    import jax

    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = make_workload(
        args.rows, args.queries, args.dim, max(2048, 8), rng
    )

    t0 = time.time()
    index = MstgIndex.build(
        data,
        MstgConfig(
            max_posting_size=max(args.rows // 250, 64),
            faster_config=True,
            use_rotator=True,
        ),
        seed=42,
        scan_dtype=args.scan_dtype,
    )
    log(f"build: {time.time()-t0:.1f}s lists={index.posting_list_count()}")

    params = MstgSearchParams(
        top_k=10, ef_search=args.ef, pruning_epsilon=args.eps
    )

    # 1) plain single-batch (the round-3 bench configuration)
    index.upload_dtype = "f32"
    index.batch_search(queries, params)  # warm-up/compile
    t0 = time.time()
    for _ in range(args.reps):
        index.batch_search(queries, params)
    plain_s = (time.time() - t0) / args.reps
    log(f"plain single-batch f32: {plain_s*1000:.1f} ms "
        f"({args.queries/plain_s:.0f} QPS)")

    # 2) pipelined 256-blocks, int8 uploads (the new serving default)
    index.upload_dtype = "int8"
    index.batch_search_pipelined(queries, params, batch_size=256)  # warm
    t0 = time.time()
    for _ in range(args.reps):
        index.batch_search_pipelined(queries, params, batch_size=256)
    piped_s = (time.time() - t0) / args.reps
    log(f"pipelined int8 b256: {piped_s*1000:.1f} ms "
        f"({args.queries/piped_s:.0f} QPS)")

    # 3) device-only: enqueue dispatches on a device-resident block,
    #    block once (amortizes dispatch RTT; excludes fetch + dedup)
    dev = index.device
    packed, fused_cblk = index._scan_planes(dev)
    enc = index._encode_queries(queries[:256], 256)
    enc = jax.device_put(enc)
    jax.block_until_ready(index._dispatch_scan(enc, params, dev, packed, fused_cblk))
    t0 = time.time()
    outs = [
        index._dispatch_scan(enc, params, dev, packed, fused_cblk)
        for _ in range(8)
    ]
    jax.block_until_ready(outs)
    dev_s = (time.time() - t0) / 8
    log(f"device-only 256-block: {dev_s*1000:.1f} ms "
        f"(~{256/dev_s:.0f} QPS device ceiling)")

    # 4) host finalize cost on the fetched arrays (dedup itself now runs
    #    on device inside _dispatch_scan; the fetch is [B, top_k])
    ids, dists = jax.device_get(outs[0])
    log(f"fetched result block shape: ids {ids.shape}")
    t0 = time.time()
    for _ in range(20):
        index._dedup_results(ids, dists, params.top_k)
    log(f"host finalize per 256-block: {(time.time()-t0)/20*1000:.1f} ms")

    print(
        {
            "plain_ms": round(plain_s * 1000, 1),
            "pipelined_ms": round(piped_s * 1000, 1),
            "device_block_ms": round(dev_s * 1000, 1),
        }
    )


if __name__ == "__main__":
    main()
