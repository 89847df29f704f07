"""End-to-end MSTG recall-vs-ef probe on CPU (dense scan path).

Quantifies what the clustering global polish (``_global_polish``) buys in
actual search recall — the nav-diag coverage numbers are an upper bound;
this probe includes quantization error, ef navigation, ε-pruning and
closure dedup. CPU-forced so it never touches the TPU tunnel.

Usage: python tools/mstg_recall_probe.py [--rows 60000] [--dim 128]
           [--refine-iters 12] [--queries 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_or_make_workload as make_workload  # noqa: E402
from tools.mstg_nav_diag import topk  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--refine-iters", type=int, default=12)
    ap.add_argument("--max-posting", type=int, default=None)
    args = ap.parse_args()

    from unittest import mock

    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams
    from rabitq_tpu.index.mstg import clustering as cl

    rng = np.random.default_rng(7)
    data, queries = make_workload(args.rows, args.queries, args.dim, 2048, rng)
    queries = queries[: args.queries]
    gt = topk(data, queries, args.top_k)
    max_posting = args.max_posting or max(args.rows // 250, 64)

    orig = cl.hierarchical_cluster

    def patched(*a, **kw):
        kw["refine_iters"] = args.refine_iters
        return orig(*a, **kw)

    t0 = time.time()
    with mock.patch.object(cl, "hierarchical_cluster", patched), mock.patch(
        "rabitq_tpu.index.mstg.index.hierarchical_cluster", patched
    ):
        index = MstgIndex.build(
            data,
            MstgConfig(max_posting_size=max_posting, faster_config=True),
            seed=42,
            scan_dtype="bf16",
        )
    print(
        f"build {time.time()-t0:.0f}s lists={index.posting_list_count()} "
        f"refine_iters={args.refine_iters}",
        flush=True,
    )

    for ef in (8, 16, 32, 64, 128, 256):
        if ef > index.posting_list_count():
            break
        params = MstgSearchParams(
            top_k=args.top_k, ef_search=ef, pruning_epsilon=0.6
        )
        hits = index.batch_search(queries, params)
        ids = np.array(
            [[h.id for h in row] + [-1] * (args.top_k - len(row)) for row in hits]
        )
        rec = np.mean(
            [
                len(set(ids[i].tolist()) & set(gt[i].tolist())) / args.top_k
                for i in range(len(gt))
            ]
        )
        print(f"ef={ef:4d}: recall@{args.top_k} = {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
