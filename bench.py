"""Headline benchmark: QPS at recall@10 >= 0.95 on a GIST-like workload.

The reference's published baseline is GIST-1M (960-d, L2): IVF ~3-5 QPS
single-query at high recall on a CPU host (BASELINE.md). The GIST fvecs
files are not present in this image, so this benchmark uses a synthetic
960-d dataset (clustered Gaussians, matching GIST's dimensionality and
metric) and reports QPS at the BASELINE.json operating point
(recall@10 >= 0.95, 7-bit codes).

``vs_baseline`` scales the reference's ~5 QPS GIST-1M figure linearly to
this dataset's row count (CPU scan cost is linear in N), i.e.
baseline_qps = 5 * (1M / N). With N = 200k the comparison point is 25 QPS.

Usage: python bench.py [--rows N] [--queries Q] [--nlist K] [--small]
Prints exactly one JSON line on stdout (progress goes to stderr).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_dataset(n, dim, n_centers, rng, centers=None, sigma=0.35):
    """Clustered Gaussian data (GIST-like structure, not uniform noise)."""
    if centers is None:
        centers = rng.standard_normal((n_centers, dim)).astype(np.float32)
    assign = rng.integers(0, centers.shape[0], n)
    data = centers[assign] + sigma * rng.standard_normal((n, dim)).astype(np.float32)
    return data.astype(np.float32)


def make_workload(rows, n_queries, dim, n_centers, rng, sigma=None):
    """(data, queries): overlapping Gaussian blobs with queries drawn
    IN-DISTRIBUTION (same center mixture as the data), like real GIST
    query sets.

    Calibration (measured, BENCHMARKS.md): queries from 8 fresh centers
    are out-of-distribution in high dim — a query's true neighbors
    scatter across many clusters and every cluster-routed method
    degenerates (MSTG recall ~= the probed-list fraction). Too-small
    sigma makes blobs separable enough that tiny nprobe already recalls
    ~0.99 — no tradeoff curve to measure. Difficulty is set by the
    cross-blob distance gap (~2d) against the within-blob distance
    spread (~sigma^2 sqrt(8d)), so constant difficulty needs
    sigma ~ d^(1/4): the default 1.5 * (d/128)^0.25 (~2.5 at 960-d)
    reproduces the reference's published GIST curve shape — recall@100
    climbing from ~0.7 to ~0.97+ across an nprobe sweep.
    """
    if sigma is None:
        sigma = 1.5 * (dim / 128.0) ** 0.25
    centers = rng.standard_normal((n_centers, dim)).astype(np.float32)
    data = make_dataset(rows, dim, n_centers, rng, centers=centers, sigma=sigma)
    queries = make_dataset(n_queries, dim, n_centers, rng, centers=centers, sigma=sigma)
    return data, queries


def load_or_make_workload(rows, n_queries, dim, n_centers, rng):
    """make_workload with an on-disk cache (data/bench_cache/).

    Generating the 1M x 960 workload costs ~25 min of single-core numpy on
    the benchmark host; the draw is deterministic given (rows, dim,
    n_centers, seed), so cache the arrays and mmap the big one back. The
    cache lives under data/ (gitignored) next to the sweep datasets.
    """
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "bench_cache"
    )
    tag = f"{rows}x{dim}_c{n_centers}_q{n_queries}_s7v1"
    dpath = os.path.join(cache_dir, f"data_{tag}.npy")
    qpath = os.path.join(cache_dir, f"queries_{tag}.npy")
    if os.path.exists(dpath) and os.path.exists(qpath):
        data = np.load(dpath, mmap_mode="r")
        queries = np.load(qpath)
        if data.shape == (rows, dim) and queries.shape == (n_queries, dim):
            log(f"workload: cached ({dpath})")
            return data, queries
        log("workload cache shape mismatch; regenerating")
    data, queries = make_workload(rows, n_queries, dim, n_centers, rng)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(dpath, data)
        np.save(qpath, queries)
        log(f"workload: cached to {cache_dir}")
    except OSError as e:
        log(f"workload cache write skipped: {e}")
    return data, queries


def gt_cache_paths(rows, dim, nlist, queries, top_k, variant=""):
    """(preferred, fallback) groundtruth cache paths for a bench config.

    Single source of truth for the cache key — tools/rebuild_bench_cache.py
    imports this so the two can never drift. ``variant`` distinguishes
    modified workloads (e.g. the bridged replication variant) whose rows
    differ from the deterministic draw.
    """
    key = hashlib.sha1(
        f"{rows}-{dim}-{nlist}-{queries}-{top_k}-v4{variant}".encode()
    ).hexdigest()[:16]
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "bench_cache"
    )
    return (
        os.path.join(cache_dir, f"gt_{key}.npy"),
        f"/tmp/rabitq_bench_gt_{key}.npy",
    )


def load_or_make_groundtruth(data, queries, rows, dim, nlist, top_k, variant=""):
    """Exact top-k groundtruth with the on-disk cache (data/bench_cache/
    preferred, /tmp fallback). Computing it uploads the full dataset
    through the tunnel (~3 min at 1M); the cache key is the workload
    config, which fully determines the deterministic draw."""
    cache_path, tmp_path = gt_cache_paths(
        rows, dim, nlist, queries.shape[0], top_k, variant
    )
    if os.path.exists(cache_path):
        log(f"groundtruth: cached ({cache_path})")
        return np.load(cache_path)
    if os.path.exists(tmp_path):
        log(f"groundtruth: cached ({tmp_path})")
        return np.load(tmp_path)
    log("computing exact groundtruth ...")
    t0 = time.time()
    gt = exact_groundtruth(data, queries, top_k)
    try:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        np.save(cache_path, gt)
    except OSError:
        np.save(tmp_path, gt)
    log(f"groundtruth: {time.time()-t0:.1f}s")
    return gt


def exact_groundtruth(data, queries, k, block=50_000):
    import jax
    import jax.numpy as jnp

    q = jnp.asarray(queries)
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)

    best_d = None
    best_i = None
    for s in range(0, data.shape[0], block):
        blk = jnp.asarray(data[s : s + block])
        d2 = (
            q_sq
            + jnp.sum(blk * blk, axis=-1)[None, :]
            - 2.0 * jnp.dot(q, blk.T, preferred_element_type=jnp.float32)
        )
        d, i = jax.lax.top_k(-d2, k)
        i = i + s
        if best_d is None:
            best_d, best_i = d, i
        else:
            dd = jnp.concatenate([best_d, d], axis=1)
            ii = jnp.concatenate([best_i, i], axis=1)
            best_d, pos = jax.lax.top_k(dd, k)
            best_i = jnp.take_along_axis(ii, pos, axis=1)
    return np.asarray(best_i)


def recall_at_k(ids, gt):
    k = gt.shape[1]
    return float(
        np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / k for i in range(len(gt))])
    )


def bench_mstg(data, queries, gt, args, block, ub, closure_eps=None):
    """One MSTG operating point: build, ef-sweep to the MSTG recall
    target, sustained-stream QPS at the chosen ef. Returns the artifact
    block (incl. the measured ``replication`` factor). ``closure_eps``
    overrides the config's closure_epsilon (the replicated variant)."""
    from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams

    top_k = args.top_k
    cfg_kwargs = dict(
        # rows/500 (-> ~2272 lists of mean ~440 rows at 1M) is the
        # round-5 geometry winner: +0.026 recall AND +60% sustained QPS
        # over the round-4 rows/250 default (BENCHMARKS.md "MSTG
        # geometry"): lists near one TN=512 tile give the exact-scan
        # kernel a probe union that compacts, and the finer partition
        # needs only ef=8 for recall 0.976
        max_posting_size=(
            args.mstg_posting_size
            if args.mstg_posting_size
            else max(args.rows // 500, 64)
        ),
        faster_config=True,
        use_rotator=True,
    )
    if closure_eps is not None:
        cfg_kwargs["closure_epsilon"] = closure_eps
    log(f"building MSTG index ({cfg_kwargs}) ...")
    t0 = time.time()
    mstg = MstgIndex.build(
        data, MstgConfig(**cfg_kwargs), seed=42, scan_dtype=args.scan_dtype
    )
    mstg_build_s = time.time() - t0
    n_lists = mstg.posting_list_count()
    replication = mstg.replication_factor()
    log(
        f"MSTG build: {mstg_build_s:.1f}s lists={n_lists} "
        f"replication={replication:.3f}"
    )

    mstg.upload_dtype = args.upload_dtype

    def mstg_run(mp):
        ids, _ = mstg.batch_search_arrays_pipelined(
            queries, mp, batch_size=block, upload_block=ub
        )
        return ids

    # ef sweep to the MSTG recall target (a defended margin above the
    # 0.95 bar), like the IVF nprobe sweep — a fixed ef is wrong across
    # list counts (finer partitions need proportionally larger ef for the
    # same probed-row budget). The grid reaches down to ef=8: the global
    # polish (clustering._global_polish) puts the true NN's list at
    # median centroid rank 0.
    mstg_rec, mstg_qps, mstg_ef = 0.0, 0.0, 0
    for ef in (8, 12, 16, 24, 32, 48, 64, 96, 128, 256, 512, 1024):
        if ef > n_lists and mstg_ef:
            break
        mp = MstgSearchParams(top_k=top_k, ef_search=ef, pruning_epsilon=0.6)
        ids = mstg_run(mp)  # warm-up + recall
        # dedup invariant at scale: a replicated row reached through two
        # probed home lists must appear once in the extraction
        srt = np.sort(ids, axis=1)
        dup = (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)
        assert not dup.any(), f"duplicate ids in {int(dup.any(1).sum())} rows"
        m_rec = recall_at_k(ids, gt)
        t0 = time.time()
        for _ in range(3):
            mstg_run(mp)
        m_qps = args.queries / ((time.time() - t0) / 3)
        log(f"MSTG ef={ef} eps=0.6: recall={m_rec:.4f} QPS={m_qps:.1f}")
        mstg_rec, mstg_qps, mstg_ef = m_rec, m_qps, ef
        if m_rec >= args.mstg_target_recall:
            break
    # sustained stream at the chosen ef (same methodology as IVF)
    mp = MstgSearchParams(top_k=top_k, ef_search=mstg_ef, pruning_epsilon=0.6)
    mstg_stream_qps = 0.0
    for _ in range(2):
        t0 = time.time()
        mstg.batch_search_arrays_pipelined(
            np.tile(queries, (3, 1)), mp, batch_size=block, upload_block=ub
        )
        mstg_stream_qps = max(
            mstg_stream_qps, 3 * args.queries / (time.time() - t0)
        )
    log(f"MSTG sustained stream: {mstg_stream_qps:.1f} QPS")
    out = {
        "build_seconds": round(mstg_build_s, 1),
        "recall": round(mstg_rec, 4),
        "qps": round(mstg_stream_qps, 1),
        "qps_per_call": round(mstg_qps, 1),
        "ef_search": mstg_ef,
        "lists": n_lists,
        "max_posting_size": cfg_kwargs["max_posting_size"],
        "replication": round(replication, 3),
    }
    if closure_eps is not None:
        out["closure_epsilon"] = closure_eps
    return out


def main():
    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    if cache_dir:
        log(f"compile cache: {cache_dir}")
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--total-bits", type=int, default=7)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--target-recall", type=float, default=0.95)
    ap.add_argument(
        "--mstg", dest="mstg", action="store_true", default=True,
        help="also benchmark an MSTG operating point (default on)",
    )
    ap.add_argument(
        "--no-mstg", dest="mstg", action="store_false",
        help="skip the MSTG operating point",
    )
    ap.add_argument(
        "--mstg-target-recall", type=float, default=0.955,
        help="the MSTG ef sweep stops at the first ef clearing THIS "
        "recall, a defended margin above the 0.95 bar (round-4's ef=16 "
        "point sat 0.0006 above it — one reseed from invalid)",
    )
    ap.add_argument(
        "--mstg-posting-size", type=int, default=None,
        help="MSTG max_posting_size (default: rows/500). Smaller lists "
        "give the exact-scan kernel finer probe granularity — see "
        "BENCHMARKS.md round-5 MSTG geometry",
    )
    ap.add_argument(
        "--mstg-replication-eps", type=float, default=0.9,
        help="closure_epsilon for the REPLICATED MSTG bench variant. "
        "0 skips the variant. (On the isotropic workload epsilon alone "
        "cannot create replicas — the RNG rule rejects them "
        "structurally; see --mstg-bridge-frac.)",
    )
    ap.add_argument(
        "--mstg-bridge-frac", type=float, default=0.10,
        help="fraction of rows replaced by small-residual midpoints of "
        "blob-CENTER pairs in the replicated MSTG variant — these pass "
        "the closure RNG rule by construction (midpoints of random ROWS "
        "do not: at 960-d the row noise dominates the center "
        "separation), producing real replication (~1 + frac) so the "
        "closure+dedup stack runs at scale",
    )
    ap.add_argument("--small", action="store_true", help="tiny smoke-test config")
    ap.add_argument("--scan-dtype", default="fused8",
                    choices=["f32", "bf16", "int8", "packed", "fused", "fused8"])
    ap.add_argument("--upload-dtype", default="int8",
                    choices=["f32", "bf16", "int8", "int4"],
                    help="query upload encoding for the pipelined serving "
                    "loop (int8 = quarter the bytes of f32; measured best "
                    "in BOTH fast- and slow-tunnel sessions, "
                    "BENCHMARKS.md 'Upload encoding')")
    ap.add_argument("--pipeline-block", type=int, default=256)
    ap.add_argument("--upload-block", type=int, default=1024,
                    help="query-upload superblock size for the pipelined "
                    "serving loops (0 = put per dispatch block). With the "
                    "round-4 exact scan, dispatches are ~3.5 ms and serving "
                    "is upload-bound: ub=1024 measured 18.6k -> 23.6k "
                    "pipelined / 23.9k -> 34.1k sustained-stream QPS at the "
                    "1M headline (BENCHMARKS.md 'Superblock uploads, "
                    "revisited')")
    ap.add_argument("--compare-dtypes", action="store_true",
                    help="also measure bf16/packed at the operating point "
                    "(costs a device-layout rebuild each)")
    args = ap.parse_args()
    if args.small:
        args.rows, args.queries, args.nlist, args.dim = 20_000, 128, 128, 128
        args.batch = 512

    import jax

    log(f"devices: {jax.devices()}")
    from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType, SearchParams
    from rabitq_tpu.utils.transfer import warm_session

    # Pay the tunnel's per-process session cost (first device_get stalls
    # 20-200 s) on a background thread, overlapped with the host-side
    # workload/groundtruth loads below — otherwise it lands inside the
    # first build phase that syncs and reads as slow k-means
    # (BENCHMARKS.md "The async-put illusion").
    import threading

    warmup: dict = {}
    warm_thread = threading.Thread(
        target=lambda: warmup.__setitem__("s", warm_session()), daemon=True
    )
    warm_thread.start()

    rng = np.random.default_rng(7)
    log(f"generating {args.rows}x{args.dim} dataset ...")
    data, queries = load_or_make_workload(
        args.rows, args.queries, args.dim, max(args.nlist // 2, 8), rng
    )

    # groundtruth is deterministic given the config; cache it across runs
    # (preferred home: data/bench_cache next to the workload cache; /tmp
    # kept as a fallback read location for pre-existing caches)
    gt = load_or_make_groundtruth(
        data, queries, args.rows, args.dim, args.nlist, args.top_k
    )

    warm_thread.join()
    log(f"session warmup: {warmup.get('s')}s (overlapped with workload load)")

    log(f"building index (scan_dtype={args.scan_dtype}) ...")
    t0 = time.time()
    index = IvfRabitqIndex.train(
        data,
        nlist=args.nlist,
        total_bits=args.total_bits,
        metric=Metric.L2,
        rotator_type=RotatorType.FhtKacRotator,
        seed=42,
        use_faster_config=True,
        scan_dtype=args.scan_dtype,
    )
    index.device  # materialize HBM arrays
    build_s = time.time() - t0
    log(f"build: {build_s:.1f}s")

    # Serving configuration: pipelined fixed-size blocks (upload of block
    # i+1 overlaps block i's scan) with reduced-precision query uploads —
    # the measured QPS includes host->device query transfer, overlapped as
    # a real serving loop would.
    index.upload_dtype = args.upload_dtype
    block = min(args.pipeline_block, args.batch)
    ub = args.upload_block if args.upload_block > 0 else None

    def run_all(params):
        return index.batch_search_arrays_pipelined(
            queries, params, batch_size=block, upload_block=ub
        )

    # --- nprobe sweep (nprobe is traced; the dense paths compile once.
    # fused compiles one variant per pow2 max_tiles/probe_k bucket —
    # bounded, and each variant is reused across the sweep) ---
    nprobe_grid = [2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
    nprobe_grid = [p for p in nprobe_grid if p <= args.nlist]
    chosen = None
    qps_at = {}
    reps = 3
    for nprobe in nprobe_grid:
        params = SearchParams(top_k=args.top_k, nprobe=nprobe)
        ids, _ = run_all(params)  # warm-up on first call compiles the scan
        rec = recall_at_k(ids, gt)
        t0 = time.time()
        for _ in range(reps):
            run_all(params)
        qps = args.queries / ((time.time() - t0) / reps)
        qps_at[nprobe] = (rec, qps)
        log(f"nprobe={nprobe:5d} recall@{args.top_k}={rec:.4f} QPS={qps:.1f}")
        if rec >= args.target_recall:
            chosen = nprobe
            break

    if chosen is None:
        # never reached the target; report the best point
        chosen = nprobe_grid[-1]
    rec, qps_call = qps_at[chosen]
    params = SearchParams(top_k=args.top_k, nprobe=chosen)

    # Headline: SUSTAINED stream throughput at the operating point — one
    # pipelined call over reps x queries (tiled), so the final result
    # fetch's ~30 ms tunnel round trip amortizes over the whole stream
    # exactly as it does for a serving loop under sustained load. The
    # per-2048-call figure (one sync per call) is kept in the artifact;
    # the reference's own product metric is likewise batch throughput
    # over the full query set (ivf.rs:1743-1752).
    stream = np.tile(queries, (reps, 1))
    qps = 0.0
    for _ in range(2):
        t0 = time.time()
        index.batch_search_arrays_pipelined(
            stream, params, batch_size=block, upload_block=ub
        )
        qps = max(qps, stream.shape[0] / (time.time() - t0))
    log(f"sustained stream ({stream.shape[0]} queries): {qps:.1f} QPS")
    dtype_qps = {args.scan_dtype: qps}

    if args.compare_dtypes:
        # alternates at the operating point (each switch re-materializes
        # the device layout when the row order differs)
        for dt in ("bf16", "packed"):
            if dt == args.scan_dtype:
                continue
            try:
                index.scan_dtype = dt
                ids, _ = run_all(params)  # warm-up + recall
                rec_dt = recall_at_k(ids, gt)
                t0 = time.time()
                for _ in range(reps):
                    run_all(params)
                dtype_qps[dt] = args.queries / ((time.time() - t0) / reps)
                log(f"scan_dtype={dt}: recall={rec_dt:.4f} QPS={dtype_qps[dt]:.1f}")
                if rec_dt < args.target_recall - 0.005:
                    log(f"scan_dtype={dt} missed recall target; not eligible")
                    dtype_qps[dt] = -1.0
            except Exception as e:  # pallas kernels are optional hardware-wise
                log(f"scan_dtype={dt} failed: {type(e).__name__}: {e}")
                dtype_qps[dt] = -1.0
        index.scan_dtype = args.scan_dtype

    # single-query latency at the chosen operating point (f32 upload — a
    # single query's 4 KB transfer is dispatch-dominated either way, so
    # measure the plain configuration rather than the sweep's bf16 one)
    index.upload_dtype = "f32"
    index.batch_search_arrays(queries[:1], params)  # compile B=1
    t0 = time.time()
    for i in range(32):
        index.batch_search_arrays(queries[i : i + 1], params)
    lat_ms = (time.time() - t0) / 32 * 1000
    log(f"single-query latency at nprobe={chosen} ({args.scan_dtype}): {lat_ms:.2f} ms")

    best_dtype = args.scan_dtype
    extra = {
        "build_seconds": round(build_s, 1),
        # per-process tunnel session setup, paid overlapped with the
        # host-side workload load (NOT part of any build/serve phase)
        "session_warmup_s": warmup.get("s"),
        # phase decomposition so session variance (tunnel bandwidth /
        # compile-cache state) is visible IN the artifact: upload seconds
        # + encoding + observed MB/s, k-means, quantize (ivf.py train)
        "build_breakdown": index.build_report,
        "single_query_ms": round(lat_ms, 2),
        "recall": round(rec, 4),
        "qps_per_call": round(qps_call, 1),  # one fetch-sync per 2048
        "nprobe": chosen,
        "scan_dtype": best_dtype,
        "upload": f"{args.upload_dtype}-pipelined-b{block}-ub{ub or block}",
        "dtype_qps": {k: round(v, 1) for k, v in dtype_qps.items()},
    }

    if args.mstg:
        extra["mstg"] = bench_mstg(data, queries, gt, args, block, ub)
        m_bridge = int(args.rows * args.mstg_bridge_frac)
        if args.mstg_replication_eps > 0 and m_bridge > 0:
            # REPLICATED variant (VERDICT r4 weak/missing-2): the closure
            # multi-assignment + device dedup stack — a headline
            # reference capability (mstg/closure.rs) — was invisible to
            # every committed TPU number. Raising closure_epsilon alone
            # CANNOT fix that on this workload, and neither can midpoints
            # of random ROWS: at 960-d the per-row noise norm (~77 at
            # sigma=2.5) dominates the blob-center separation (~44), so a
            # row midpoint is still noise-dominated and the RNG rule
            # rejects its second assignment — replication stays 1.0
            # (measured; BENCHMARKS.md "Closure replication"). Real
            # datasets replicate because points lie between centroids
            # with SMALL residuals (manifold structure). Emulate exactly
            # that: bridge rows at midpoints of blob-CENTER pairs plus a
            # small residual — dist^2(v, c2) ~= s^2/4 < s^2 =
            # dist^2(c1, c2) passes the RNG rule by construction, and a
            # third center sits outside the (1+eps) threshold. Half the
            # variant's queries are drawn at midpoints of the SAME
            # bridge pairs, so both home lists of a bridge are probed
            # together and the on-device dedup path fires on (nearly)
            # every such query, with recall@k checking its correctness.
            rngb = np.random.default_rng(99)
            keep = args.rows - m_bridge
            n_centers = max(args.nlist // 2, 8)
            # the workload's generating centers: the first draw of rng(7)
            # in make_workload (reproduced here so the cached dataset
            # needn't carry them)
            centers = (
                np.random.default_rng(7)
                .standard_normal((n_centers, args.dim))
                .astype(np.float32)
            )
            pa = rngb.integers(0, n_centers, m_bridge)
            pb = (pa + 1 + rngb.integers(0, n_centers - 1, m_bridge)) % n_centers
            bridges = 0.5 * (centers[pa] + centers[pb]) + 0.3 * rngb.standard_normal(
                (m_bridge, args.dim)
            ).astype(np.float32)
            data_v = np.ascontiguousarray(
                np.concatenate([data[:keep], bridges]), np.float32
            )
            queries_v = np.array(queries, np.float32, copy=True)
            qm = queries_v.shape[0] // 2
            qsel = rngb.integers(0, m_bridge, queries_v.shape[0] - qm)
            queries_v[qm:] = 0.5 * (
                centers[pa[qsel]] + centers[pb[qsel]]
            ) + 0.3 * rngb.standard_normal(
                (queries_v.shape[0] - qm, args.dim)
            ).astype(np.float32)
            gt_v = load_or_make_groundtruth(
                data_v, queries_v, args.rows, args.dim, args.nlist,
                args.top_k, variant=f"-cbridge{m_bridge}",
            )
            extra["mstg"]["replicated_variant"] = bench_mstg(
                data_v, queries_v, gt_v, args, block, ub,
                closure_eps=args.mstg_replication_eps,
            )
            extra["mstg"]["replicated_variant"]["bridge_rows"] = m_bridge

    baseline_qps = 5.0 * (1_000_000 / args.rows)
    result = {
        "metric": (
            f"synthetic-gist{args.dim}d-{args.rows//1000}k batched QPS at "
            f"recall@{args.top_k}>={args.target_recall} ({args.total_bits}-bit, "
            f"nprobe={chosen}, recall={rec:.3f}, {best_dtype})"
        ),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / baseline_qps, 2),
        # the comparison's own caveats, carried IN the artifact: the
        # baseline is the reference's published GIST-1M IVF figure — a
        # SERIAL single-thread latency-inverted CPU number (BASELINE.md) —
        # row-scaled to this dataset, while `value` is pipelined batched
        # TPU throughput on a synthetic GIST-calibrated workload.
        "baseline_kind": "reference serial-CPU latency-inverted IVF QPS, row-scaled",
        "workload": f"synthetic-calibrated-{args.dim}d (bench.py make_workload)",
        "extra": extra,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
