"""Performance probe — parity with ``examples/performance_test.rs``:
build + timed batched search at several nprobe values, with warm-up.

Usage: python examples/performance_test.py [rows] [dim]
"""

import sys
import time

import numpy as np

from rabitq_tpu import IvfRabitqIndex, SearchParams


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(1)
    data = rng.standard_normal((rows, dim)).astype(np.float32)
    queries = data[:256]

    t0 = time.time()
    index = IvfRabitqIndex.train(
        data, nlist=max(rows // 200, 8), total_bits=7, seed=1, use_faster_config=True
    )
    print(f"build: {time.time()-t0:.1f}s ({rows} x {dim})")

    for nprobe in (4, 16, 64):
        params = SearchParams(top_k=10, nprobe=nprobe)
        index.batch_search_arrays(queries, params)  # warm-up / compile
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            index.batch_search_arrays(queries, params)
        dt = (time.time() - t0) / reps
        print(f"nprobe={nprobe:3d}: {dt*1000/len(queries):.3f} ms/query "
              f"({len(queries)/dt:.0f} QPS batched)")


if __name__ == "__main__":
    main()
