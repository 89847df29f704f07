"""Decompose the MSTG serving dispatch at the 1M operating point.

VERDICT round-3 weak-3: MSTG trails IVF ~1.7x at similar recall with no
decomposition. This probe measures, in ONE session at ef=32 / b=256:

  * scan-program ms/dispatch (deep reps) per variant:
      - baseline (two-stage, compaction gate decides — dense at ef=32)
      - RABITQ_FUSED_COMPACT=force (full-length needed-first tile list:
        the gate's distinct-uniform union model overestimates sorted
        blocks, so forcing may win exactly like IVF's full-length list)
      - RABITQ_FUSED_EXACT on/off (exact in-kernel scoring vs stage-2)
  * the dedup program's own ms (it is a SECOND dispatch per block)
  * recall@10 + pipelined + steady QPS for baseline and the best variant

The 1M MSTG index builds once (~240-530 s) and persists to
data/probe_1m.mstg for later runs (native v1003).

Usage: python tools/mstg_decompose.py [--ef 32] [--block 256]
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
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--nlist", type=int, default=4096)  # workload cache key
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--ef", type=int, default=32)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--scan-dtype", default="fused8")
    ap.add_argument(
        "--index-path",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "probe_1m.mstg",
        ),
    )
    args = ap.parse_args()

    import jax

    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams
    from rabitq_tpu.index.loader import load_index
    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = load_or_make_workload(
        args.rows, args.queries, args.dim, max(args.nlist // 2, 8), rng
    )
    t0 = time.time()
    if os.path.exists(args.index_path):
        index = load_index(args.index_path, scan_dtype=args.scan_dtype)
        log(f"load: {time.time()-t0:.1f}s")
    else:
        index = MstgIndex.build(
            data,
            MstgConfig(
                max_posting_size=max(args.rows // 250, 64),
                faster_config=True,
                use_rotator=True,
            ),
            seed=42,
            scan_dtype=args.scan_dtype,
        )
        log(f"build: {time.time()-t0:.1f}s lists={index.posting_list_count()}")
        t0 = time.time()
        index.save_to_path(args.index_path)
        log(f"save: {time.time()-t0:.1f}s -> {args.index_path}")
    index.upload_dtype = "int8"
    gt = load_or_make_groundtruth(
        data, queries, args.rows, args.dim, args.nlist, args.top_k
    )
    params = MstgSearchParams(
        top_k=args.top_k, ef_search=args.ef, pruning_epsilon=0.6
    )
    n_lists = index.posting_list_count()
    sizes = np.diff(index._offsets)
    results = {
        "lists": n_lists,
        "replication": round(float(index.replication_factor()), 3),
        "mean_list": round(float(sizes.mean()), 1),
        "p95_list": int(np.percentile(sizes, 95)),
    }
    log(
        f"lists={n_lists} repl={results['replication']} "
        f"mean={results['mean_list']} p95={results['p95_list']}"
    )
    bs = args.block

    def dispatch_ms(tag):
        index._max_tiles_cache = {}
        dev = index.device
        packed, fused_cblk = index._scan_planes(dev)
        one = jax.device_put(index._encode_queries(queries[:bs], bs))
        jax.block_until_ready(one)
        log(
            f"{tag}: max_tiles="
            f"{index._fused_max_tiles(args.ef, batch=bs)} "
            f"exact={index._fused_exact_ok()}"
        )
        t0 = time.time()
        jax.device_get(
            index._dispatch_scan(one, params, dev, packed, fused_cblk)
        )
        log(f"{tag}: warm-up (compile) {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            jax.device_get(
                [
                    index._dispatch_scan(one, params, dev, packed, fused_cblk)
                    for _ in range(args.depth)
                ]
            )
            best = min(best, (time.time() - t0) / args.depth)
        log(f"{tag}: {best*1e3:.3f} ms/dispatch")
        return round(best * 1e3, 3)

    variants = {
        "baseline": {},
        "force_compact": {"RABITQ_FUSED_COMPACT": "force"},
        "twostage": {"RABITQ_FUSED_EXACT": "0"},
        "force_twostage": {
            "RABITQ_FUSED_COMPACT": "force",
            "RABITQ_FUSED_EXACT": "0",
        },
    }
    saved = {k: os.environ.get(k) for k in
             ("RABITQ_FUSED_COMPACT", "RABITQ_FUSED_EXACT")}
    for tag, env in variants.items():
        for k in saved:
            if saved[k] is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = saved[k]
        os.environ.update(env)
        results[f"{tag}_ms"] = dispatch_ms(tag)
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v

    # dedup program alone (the SECOND dispatch of every serving block)
    import jax.numpy as jnp

    rr = max(
        params.resolved_rerank(),
        int(np.ceil(params.top_k * index.replication_factor())) + 16,
    )
    fake_ids = jnp.asarray(
        rng.integers(0, args.rows, size=(bs, rr)), jnp.int32
    )
    fake_d = jnp.asarray(
        np.sort(rng.random((bs, rr)).astype(np.float32), axis=1)
    )
    jax.block_until_ready((fake_ids, fake_d))
    jax.device_get(index._dedup_topk_device(fake_ids, fake_d, top_k=args.top_k))
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        jax.device_get(
            [
                index._dedup_topk_device(fake_ids, fake_d, top_k=args.top_k)
                for _ in range(args.depth)
            ]
        )
        best = min(best, (time.time() - t0) / args.depth)
    results["dedup_ms"] = round(best * 1e3, 3)
    log(f"dedup: {best*1e3:.3f} ms/dispatch (rerank width {rr})")

    # serving QPS: baseline vs best variant
    def serve(tag, env):
        for k in saved:
            os.environ.pop(k, None)
        os.environ.update(env)
        index._max_tiles_cache = {}
        hits = index.batch_search_pipelined(queries, params, batch_size=bs)
        ids = np.array(
            [[h.id for h in row] + [-1] * (args.top_k - len(row)) for row in hits]
        )
        rec = recall_at_k(ids, gt)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.batch_search_pipelined(queries, params, batch_size=bs)
            best = min(best, time.time() - t0)
        piped = args.queries / best
        sbest = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            index.batch_search_pipelined(
                np.tile(queries, (3, 1)), params, batch_size=bs
            )
            sbest = min(sbest, (time.time() - t0) / 3)
        steady = args.queries / sbest
        log(f"{tag}: recall {rec:.4f} pipelined {piped:.0f} steady {steady:.0f}")
        return {
            "recall": round(rec, 4),
            "pipelined_qps": round(piped, 1),
            "steady_qps": round(steady, 1),
        }

    results["serve_baseline"] = serve("serve baseline", {})
    best_tag = min(variants, key=lambda t: results[f"{t}_ms"])
    if best_tag != "baseline":
        results["serve_best"] = {
            "variant": best_tag,
            **serve(f"serve {best_tag}", variants[best_tag]),
        }
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    print(json.dumps(results))


if __name__ == "__main__":
    main()
