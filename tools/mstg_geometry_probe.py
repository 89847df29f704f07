"""MSTG posting-list geometry vs serving (VERDICT r5 directive 1).

Round-4 diagnosis: MSTG serving loses to IVF because its 1171x854-row
lists hand every 128-query block a near-dense probed-tile union (the
exact-scan kernel pays ~8-9 us/tile; IVF's 4096x244 geometry compacts to
~400-512 tiles/block). This probe builds the SAME 1M workload's MSTG at
several ``max_posting_size`` values and sweeps ef — recall, pipelined
QPS, sustained QPS, and the compaction gate's decision per point.

Usage: python tools/mstg_geometry_probe.py --posting-sizes 4000 1000 500
       [--efs 8 12 16 24 32 48 64] [--rows N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import load_or_make_groundtruth, load_or_make_workload, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--posting-sizes", type=int, nargs="+",
                    default=[1000, 500])
    ap.add_argument("--efs", type=int, nargs="+",
                    default=[8, 12, 16, 24, 32, 48, 64])
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--target-recall", type=float, default=0.955)
    ap.add_argument("--stream-once", action="store_true",
                    help="only measure the sustained stream at the first "
                    "ef clearing the target (saves session time)")
    args = ap.parse_args()

    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = load_or_make_workload(
        args.rows, args.queries, args.dim, 2048, rng
    )
    gt = load_or_make_groundtruth(
        data, queries, args.rows, args.dim, 4096, args.top_k
    )

    from bench import recall_at_k
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    out = []
    for ps in args.posting_sizes:
        log(f"=== max_posting_size={ps} ===")
        t0 = time.time()
        mstg = MstgIndex.build(
            data,
            MstgConfig(max_posting_size=ps, faster_config=True, use_rotator=True),
            seed=42,
            scan_dtype="fused8",
        )
        build_s = time.time() - t0
        sizes = np.diff(mstg._offsets)
        geo = {
            "max_posting_size": ps,
            "build_s": round(build_s, 1),
            "lists": int(len(sizes)),
            "mean_size": round(float(sizes.mean()), 1),
            "p95_size": int(np.percentile(sizes, 95)),
            "replication": round(mstg.replication_factor(), 4),
        }
        log(json.dumps(geo))
        mstg.upload_dtype = "int8"
        points = []
        hit = False
        for ef in args.efs:
            mp = MstgSearchParams(
                top_k=args.top_k, ef_search=ef, pruning_epsilon=0.6
            )
            t0 = time.time()
            hits = mstg.batch_search_pipelined(
                queries, mp, batch_size=256, upload_block=1024
            )
            warm_s = time.time() - t0
            ids = np.array(
                [[h.id for h in row] + [-1] * (args.top_k - len(row))
                 for row in hits]
            )
            rec = recall_at_k(ids, gt)
            t0 = time.time()
            for _ in range(3):
                mstg.batch_search_pipelined(
                    queries, mp, batch_size=256, upload_block=1024
                )
            qps = args.queries / ((time.time() - t0) / 3)
            mt = mstg._fused_max_tiles(ef, batch=256)
            point = {
                "ef": ef, "recall": round(rec, 4), "qps": round(qps, 1),
                "max_tiles": mt, "warm_s": round(warm_s, 1),
            }
            if rec >= args.target_recall and not (hit and args.stream_once):
                stream = np.tile(queries, (3, 1))
                best = 0.0
                for _ in range(2):
                    t0 = time.time()
                    mstg.batch_search_pipelined(
                        stream, mp, batch_size=256, upload_block=1024
                    )
                    best = max(best, stream.shape[0] / (time.time() - t0))
                point["sustained_qps"] = round(best, 1)
                hit = True
            points.append(point)
            log(json.dumps(point))
            if hit and rec >= args.target_recall + 0.01:
                break
        out.append({"geometry": geo, "points": points})
        del mstg

    print(json.dumps(out))


if __name__ == "__main__":
    main()
