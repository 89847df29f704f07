"""TB x locality-key matrix at the 1M headline point (VERDICT r3 #4).

The fused kernel's query-tile height TB bounds each block's
probed-cluster union (smaller blocks share fewer clusters -> shorter
compacted tile lists) but also splits the batch into more grid rows
(each re-streaming its tiles). The locality sort key groups queries so
blocks share clusters; depth 2 keys on the top TWO ranked centroids.

TB is baked at module import (RABITQ_FUSED_TB), so each cell runs in a
SUBPROCESS with its env; the persistent compile cache keeps repeat
loads cheap. Per cell: full-program ms/dispatch at b=256 (depth 16),
recall@10, steady QPS, plus the host-computed per-block probed-tile
union (scanned tiles) vs the per-query need.

Usage: python tools/tb_matrix.py [--tbs 128,64,32] [--locs 1,2]
(The single-cell worker mode is internal: --cell TB LOC.)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_cell(tb: int, loc: int, args) -> dict:
    env = dict(os.environ)
    env["RABITQ_FUSED_TB"] = str(tb)
    env["RABITQ_LOCALITY"] = str(loc)
    cmd = [
        sys.executable, os.path.abspath(__file__), "--cell",
        "--tb", str(tb), "--loc", str(loc),
        "--nprobe", str(args.nprobe), "--block", str(args.block),
        "--queries", str(args.queries),
    ]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True)
    sys.stderr.write(out.stderr)
    if out.returncode != 0:
        return {"error": f"exit {out.returncode}"}
    return json.loads(out.stdout.strip().splitlines()[-1])


def cell_main(args):
    from bench import (
        load_or_make_workload,
        load_or_make_groundtruth,
        recall_at_k,
    )

    import jax

    from rabitq_tpu import IvfRabitqIndex, SearchParams
    from rabitq_tpu.ops.pallas_fused_scan import TB, TN
    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    assert TB == args.tb, (TB, args.tb)
    enable_compilation_cache()
    rng = np.random.default_rng(7)
    data, queries = load_or_make_workload(
        1_000_000, args.queries, 960, 2048, rng
    )
    t0 = time.time()
    index = IvfRabitqIndex.load_from_path(
        os.path.join(REPO, "data", "probe_1m.rbq")
    )
    index.scan_dtype = "fused8"
    index.upload_dtype = "int8"
    log(f"[tb={args.tb} loc={args.loc}] load: {time.time()-t0:.1f}s")
    gt = load_or_make_groundtruth(data, queries, 1_000_000, 960, 4096, 10)
    params = SearchParams(top_k=10, nprobe=args.nprobe)
    bs = args.block

    # host-side union statistics: per TB-block of locality-sorted queries,
    # how many row tiles the block's probed clusters span vs the per-query
    # need (nprobe clusters' tiles)
    dev, packed, row_allowed = index._scan_inputs(None)
    import jax.numpy as jnp

    q_rot = np.asarray(index._rotate_jit(jnp.asarray(queries[:bs])))
    cents = np.asarray(dev.centroids)
    d2 = (
        (q_rot**2).sum(1)[:, None]
        - 2 * q_rot @ cents.T
        + (cents**2).sum(1)[None, :]
    )
    ranked = np.argsort(d2, axis=1)[:, : args.nprobe]
    if args.loc >= 2:
        order = np.argsort(ranked[:, 0] * cents.shape[0] + ranked[:, 1])
    else:
        order = np.argsort(ranked[:, 0])
    ranked = ranked[order]
    sizes = np.diff(index._offsets)
    off = np.concatenate([[0], np.cumsum(sizes)])
    lo_t, hi_t = off[:-1] // TN, (np.maximum(off[1:] - 1, 0)) // TN
    scanned, needed = 0, 0
    for s in range(0, bs, args.tb):
        cl = np.unique(ranked[s : s + args.tb].ravel())
        tiles = set()
        for c in cl:
            tiles.update(range(lo_t[c], hi_t[c] + 1))
        scanned += len(tiles)
        needed += sum(hi_t[c] - lo_t[c] + 1 for c in cl) / max(len(cl), 1) * args.nprobe
    n_blocks = (bs + args.tb - 1) // args.tb

    one = jax.device_put(index._pad_queries(queries[:bs], bs))
    jax.block_until_ready(one)
    t0 = time.time()
    jax.device_get(index._dispatch_scan(one, params, dev, packed, row_allowed))
    log(f"[tb={args.tb} loc={args.loc}] warm-up {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.device_get(
            [
                index._dispatch_scan(one, params, dev, packed, row_allowed)
                for _ in range(16)
            ]
        )
        best = min(best, (time.time() - t0) / 16)
    ids, _ = index.batch_search_arrays_pipelined(queries, params, batch_size=bs)
    rec = recall_at_k(ids, gt)
    sbest = float("inf")
    for _ in range(3):
        t0 = time.time()
        pending = []
        for _w in range(3):
            for s in range(0, args.queries, bs):
                cur = jax.device_put(index._pad_queries(queries[s : s + bs], bs))
                pending.append(
                    index._dispatch_scan(cur, params, dev, packed, row_allowed)
                )
        jax.device_get(pending)
        sbest = min(sbest, (time.time() - t0) / 3)
    out = {
        "tb": args.tb,
        "loc": args.loc,
        "full_ms": round(best * 1e3, 3),
        "recall": round(rec, 4),
        "steady_qps": round(args.queries / sbest, 1),
        "scanned_tiles_per_block": round(scanned / n_blocks, 1),
        "needed_tiles_per_query": round(needed / n_blocks, 1),
    }
    log(f"[tb={args.tb} loc={args.loc}] {out}")
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tbs", default="128,64,32")
    ap.add_argument("--locs", default="1,2")
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--cell", action="store_true")
    ap.add_argument("--tb", type=int, default=128)
    ap.add_argument("--loc", type=int, default=1)
    args = ap.parse_args()
    if args.cell:
        cell_main(args)
        return
    results = {}
    for tb in [int(t) for t in args.tbs.split(",")]:
        for loc in [int(v) for v in args.locs.split(",")]:
            results[f"tb{tb}_loc{loc}"] = run_cell(tb, loc, args)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
