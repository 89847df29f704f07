"""GIST benchmark — parity with ``examples/benchmark_gist.rs``: build an
IVF index on GIST-1M fvecs files and report build time + recall@1/10/100
vs nprobe.

Usage:
    python examples/benchmark_gist.py BASE.fvecs QUERY.fvecs GT.ivecs \
        [--nlist 4096] [--total-bits 7] [--limit N]
"""

import argparse
import time

import numpy as np

from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType, SearchParams
from rabitq_tpu.io.vecio import read_fvecs, read_groundtruth


def recall(results_ids: np.ndarray, gt: np.ndarray, k: int) -> float:
    hits = sum(
        len(set(results_ids[i][:k].tolist()) & set(gt[i][:k].tolist()))
        for i in range(len(gt))
    )
    return hits / (len(gt) * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("queries")
    ap.add_argument("groundtruth")
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--total-bits", type=int, default=7)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    base = read_fvecs(args.base, args.limit)
    queries = read_fvecs(args.queries)
    gt = read_groundtruth(args.groundtruth)
    print(f"base {base.shape}, queries {queries.shape}")

    t0 = time.time()
    index = IvfRabitqIndex.train(
        base,
        nlist=args.nlist,
        total_bits=args.total_bits,
        metric=Metric.L2,
        rotator_type=RotatorType.FhtKacRotator,
        seed=42,
        use_faster_config=True,
    )
    build_ms = (time.time() - t0) * 1000
    print(f"build_time_ms: {build_ms:.0f}")

    for nprobe in (4, 8, 16, 32, 64, 128, 256):
        params = SearchParams(top_k=100, nprobe=nprobe)
        all_ids = []
        # warm-up compile on first batch size
        index.batch_search_arrays(queries[: args.batch], params)
        t0 = time.time()
        for s in range(0, len(queries), args.batch):
            ids, _ = index.batch_search_arrays(queries[s : s + args.batch], params)
            all_ids.append(ids)
        dt = time.time() - t0
        ids = np.concatenate(all_ids)
        print(
            f"nprobe={nprobe:4d}  QPS={len(queries)/dt:8.1f}  "
            f"recall@1={recall(ids, gt, 1):.4f}  "
            f"recall@10={recall(ids, gt, 10):.4f}  "
            f"recall@100={recall(ids, gt, 100):.4f}"
        )


if __name__ == "__main__":
    main()
