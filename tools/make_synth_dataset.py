"""Materialize the benchmark's synthetic GIST-like dataset as fvecs/ivecs.

``bench.py`` generates its workload in-process; the sweep CLI
(``python -m rabitq_tpu sweep``) consumes files, like the reference's
``examples/recall_qps_sweep.rs`` consumes GIST fvecs. This tool writes the
EXACT same dataset bench.py uses (same generator, same seed, same draw
order) so sweep results and headline bench numbers are on one workload:

    python tools/make_synth_dataset.py --out /tmp/synth1m \
        [--rows 1000000] [--dim 960] [--queries 1000] [--k 100]

Outputs: base.fvecs, query.fvecs, gt{k}.ivecs (exact L2 groundtruth,
computed blockwise on the attached device).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import exact_groundtruth, load_or_make_workload  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--nlist", type=int, default=4096, help="bench.py center-count coupling")
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--k", type=int, default=100)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    from rabitq_tpu.io.vecio import write_fvecs, write_ivecs

    # identical draw order to bench.py (data, then 2048 in-distribution queries)
    rng = np.random.default_rng(7)
    print(f"generating {args.rows}x{args.dim} ...", file=sys.stderr, flush=True)
    data, queries = load_or_make_workload(
        args.rows, 2048, args.dim, max(args.nlist // 2, 8), rng
    )
    queries = queries[: args.queries]

    base = os.path.join(args.out, "base.fvecs")
    qf = os.path.join(args.out, "query.fvecs")
    gtf = os.path.join(args.out, f"gt{args.k}.ivecs")
    expected = args.rows * (4 + 4 * args.dim)
    if os.path.exists(base) and os.path.getsize(base) == expected:
        print(f"{base} already complete; skipping rewrite", file=sys.stderr)
    else:
        write_fvecs(base, data)
    # query file checked independently of base: a prior run with a
    # different --queries count must not leave query/gt inconsistent
    expected_q = args.queries * (4 + 4 * args.dim)
    if os.path.exists(qf) and os.path.getsize(qf) == expected_q:
        print(f"{qf} already complete; skipping rewrite", file=sys.stderr)
    else:
        write_fvecs(qf, queries)
    print(f"{base} ({os.path.getsize(base)/1e9:.2f} GB), {qf}", file=sys.stderr)

    t0 = time.time()
    gt = exact_groundtruth(data, queries, args.k)
    print(f"groundtruth@{args.k}: {time.time()-t0:.1f}s", file=sys.stderr)
    write_ivecs(gtf, gt.astype(np.int32))
    print(f"wrote {gtf}", file=sys.stderr)


if __name__ == "__main__":
    main()
