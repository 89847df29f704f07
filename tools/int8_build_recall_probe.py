"""End-to-end recall check for int8 dataset uploads (round 5).

BENCHMARKS.md "Build upload encoding" records int8's transfer win (half
of bf16's bytes) but noted no end-to-end recall point existed. This
probe builds the 1M headline index twice in one session — data_upload
bf16 (default) vs int8 — and compares recall@10 at nprobe=4 against the
cached groundtruth, plus true drained upload seconds for both.

Usage: python tools/int8_build_recall_probe.py [--rows N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import load_or_make_workload, load_or_make_groundtruth, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--nlist", type=int, default=4096)
    args = ap.parse_args()

    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from rabitq_tpu import IvfRabitqIndex, SearchParams
    from rabitq_tpu.utils.transfer import warm_session

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = load_or_make_workload(args.rows, 2048, 960, 2048, rng)
    log(f"session warmup: {warm_session()}s")
    gt = load_or_make_groundtruth(data, queries, args.rows, 960, args.nlist, 10)

    results = {}
    for enc in ("bf16", "int8"):
        t0 = time.time()
        index = IvfRabitqIndex.train(
            data, nlist=args.nlist, total_bits=7, seed=42,
            scan_dtype="fused8", data_upload=enc,
        )
        build_s = time.time() - t0
        params = SearchParams(top_k=10, nprobe=4)
        ids, _ = index.batch_search_arrays(queries, params)
        ids = np.asarray(ids)
        # recall@10 vs 10-NN groundtruth: fraction of true top-10 found
        hits = np.fromiter(
            (len(set(row.tolist()) & set(g.tolist())) for row, g in zip(ids, gt)),
            dtype=np.int64, count=len(gt),
        )
        recall = float(hits.mean()) / 10.0
        results[enc] = {
            "build_s": round(build_s, 1),
            "upload": index.build_report.get("upload"),
            "recall_at10_nprobe4": round(recall, 4),
        }
        log(f"{enc}: {json.dumps(results[enc])}")
        del index

    print(json.dumps(results))


if __name__ == "__main__":
    main()
