"""Decompose the 1M-build k-means (VERDICT r5 directive 3).

Round-4 measured k-means at 88.7 s — 67% of the IVF build — with no
breakdown. This probe times init / Lloyd / final-assignment phases and
compares the round-5 levers on the SAME session (relative numbers):

  A. f32 assignment, fixed 25 iters (the round-4 configuration)
  B. bf16 assignment, fixed 25 iters
  C. bf16 assignment + objective early stop (tol=1e-3)

Each variant's partition is scored with an f32 assign_dataset objective
so quality shifts are visible next to the speed. One TPU client only.

Usage: python tools/kmeans_decompose.py [--rows N] [--k K]
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
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()

    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, _ = load_or_make_workload(args.rows, 2048, args.dim, 2048, rng)

    from rabitq_tpu.ops.kmeans import assign_dataset, run_kmeans
    from rabitq_tpu.utils.transfer import upload_dataset

    t0 = time.time()
    data_dev, rep = upload_dataset(data, "int8")
    log(f"upload: {rep}")

    results = {"upload": rep}
    variants = [
        ("A_f32_fixed", dict(assign_dtype="f32", tol=0.0)),
        ("B_bf16_fixed", dict(assign_dtype="bf16", tol=0.0)),
        ("C_bf16_earlystop", dict(assign_dtype="bf16", tol=args.tol)),
    ]
    for name, kw in variants:
        t0 = time.time()
        km = run_kmeans(
            data, args.k, niter=25, seed=42, data_dev=data_dev,
            with_report=True, **kw,
        )
        total = time.time() - t0
        _, obj_f32 = assign_dataset(data_dev, km.centroids, n_valid=args.rows)
        sizes = np.bincount(km.assignments, minlength=args.k)
        results[name] = {
            "total_s": round(total, 1),
            "iters": km.iters,
            "report": km.report,
            "objective_f32": float(obj_f32),
            "empty": int((sizes == 0).sum()),
            "p95_size": int(np.percentile(sizes, 95)),
        }
        log(f"{name}: {json.dumps(results[name])}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
