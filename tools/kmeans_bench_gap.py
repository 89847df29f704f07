"""Chase the bench-vs-probe k-means gap (round 5).

BENCH_r05 candidate runs showed lloyd_s = 104-135 s for 8 early-stopped
iterations, while tools/kmeans_decompose.py ran the same nominal k-means
in 9.6 s total. Two differences between the paths remained untested:

  1. dataset upload encoding (bench: bf16-decoded f32; probe: int8-decoded)
  2. whether the 104 s hides in the FIRST dispatch (a silent compile-cache
     miss => remote compile) or is a steady ~13 s/dispatch cost
     (~= a full-dataset re-transfer per step through the tunnel)

This probe times run_kmeans twice per encoding (cold-in-process, then
warm) with the round-5 ``lloyd_first_s`` split, using the bench's exact
train arguments (niter=30, seed=42, tol=1e-3, assign_dtype=bf16).

Usage: python tools/kmeans_bench_gap.py [--rows N] [--k K]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import load_or_make_workload, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--k", type=int, default=4096)
    args = ap.parse_args()

    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, _ = load_or_make_workload(args.rows, 2048, args.dim, 2048, rng)

    from rabitq_tpu.ops.kmeans import run_kmeans
    from rabitq_tpu.utils.transfer import upload_dataset

    results = {}
    for encoding in ("bf16", "int8"):
        data_dev, rep = upload_dataset(data, encoding)
        log(f"upload[{encoding}]: {rep}")
        results[f"upload_{encoding}"] = rep
        for attempt in ("cold", "warm"):
            t0 = time.time()
            km = run_kmeans(
                data, args.k, niter=30, seed=42, data_dev=data_dev,
                assign_dtype="bf16", tol=1e-3, with_report=True,
            )
            total = round(time.time() - t0, 1)
            entry = {"total_s": total, "iters": km.iters, "report": km.report}
            results[f"{encoding}_{attempt}"] = entry
            log(f"{encoding}_{attempt}: {json.dumps(entry)}")
        del data_dev

    print(json.dumps(results))


if __name__ == "__main__":
    main()
