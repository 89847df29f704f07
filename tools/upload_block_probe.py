"""Re-measure upload superblocks in the exact-scan regime.

Round 3 measured `upload_block` (one device_put per superblock, scans
dispatched per sub-window) SLOWER than put==dispatch — but that was when
a b=256 dispatch cost ~13-14 ms and any put queued before a pending
dispatch delayed it. The round-4 exact scan cut the dispatch to ~3.5 ms,
making the per-put overhead the dominant serving term; fewer, larger
puts may now win.

Measures pipelined + steady QPS at b=256 for upload_block in
{None, 512, 1024, 2048}, one session, plus recall sanity.

Usage: python tools/upload_block_probe.py
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
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--blocks", default="0,512,1024,2048")
    ap.add_argument("--reps", type=int, default=3)
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
    data, queries = load_or_make_workload(1_000_000, args.queries, 960, 2048, rng)
    t0 = time.time()
    index = IvfRabitqIndex.load_from_path(args.index_path)
    index.scan_dtype = "fused8"
    index.upload_dtype = "int8"
    log(f"load: {time.time()-t0:.1f}s")
    gt = load_or_make_groundtruth(data, queries, 1_000_000, 960, 4096, 10)
    params = SearchParams(top_k=10, nprobe=args.nprobe)
    stream = np.tile(queries, (3, 1))
    results = {}
    for ub in [int(b) for b in args.blocks.split(",")]:
        kw = {} if ub == 0 else {"upload_block": ub}
        ids, _ = index.batch_search_arrays_pipelined(
            queries, params, batch_size=args.block, **kw
        )
        rec = recall_at_k(ids, gt)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.batch_search_arrays_pipelined(
                queries, params, batch_size=args.block, **kw
            )
            best = min(best, time.time() - t0)
        piped = args.queries / best
        sbest = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.batch_search_arrays_pipelined(
                stream, params, batch_size=args.block, **kw
            )
            sbest = min(sbest, (time.time() - t0) / 3)
        steady = args.queries / sbest
        tag = "put_per_block" if ub == 0 else f"ub{ub}"
        log(f"{tag}: recall {rec:.4f} pipelined {piped:.0f} stream {steady:.0f}")
        results[tag] = {
            "recall": round(rec, 4),
            "pipelined_qps": round(piped, 1),
            "stream_qps": round(steady, 1),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
