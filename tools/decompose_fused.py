"""Decompose the fused scan's device batch into prep / stage-1 / stage-2.

The fused search is one XLA program (rotation + centroid ranking +
fused_select + survivor re-rank). This probe re-jits its pieces as
standalone programs with device-resident queries and times each with
many enqueued reps (one block at the end), so dispatch RTT amortizes:

  * prep     — rotation, query constants, g-terms, truncated centroid
               ranking (probe_k), probe-mask scatter, block-locality sort
  * select   — prep + fused_select (Pallas bin scan + selection)
  * stage2   — full - select (reported), plus a standalone cross-check
               re-ranking a fixed survivor set
  * full     — the production scan_kernel program

Usage: python tools/decompose_fused.py [--rows 1000000] [--batch 512]
       [--nprobe 4] [--rerank 400]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_or_make_workload as make_workload  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--rerank", type=int, default=400)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--scan-dtype", default="fused8")
    ap.add_argument(
        "--index-path", default="",
        help="load a saved index (e.g. data/probe_1m.rbq) instead of building",
    )
    ap.add_argument(
        "--save-index", default="",
        help="after building, save the index here for future probe runs",
    )
    ap.add_argument(
        "--prep-detail", action="store_true",
        help="also time cumulative prep sub-stages (rotation, g-terms, "
        "centroid top_k, probe-mask scatter, locality argsort)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType
    from rabitq_tpu.index.scan import probe_k_bucket, _stage2_rerank
    from rabitq_tpu.ops import estimator as est_ops
    from rabitq_tpu.ops.pallas_fused_scan import BIG, fused_select

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, queries = make_workload(
        args.rows, args.batch, args.dim, max(args.nlist // 2, 8), rng
    )

    t0 = time.time()
    if args.index_path and os.path.exists(args.index_path):
        index = IvfRabitqIndex.load_from_path(args.index_path)
        index.scan_dtype = args.scan_dtype
        log(f"load: {time.time()-t0:.1f}s")
        if args.save_index:
            log("--save-index ignored: index was LOADED from --index-path")
    else:
        index = IvfRabitqIndex.train(
            data, nlist=args.nlist, total_bits=7, metric=Metric.L2,
            rotator_type=RotatorType.FhtKacRotator, seed=42,
            use_faster_config=True, scan_dtype=args.scan_dtype,
        )
        log(f"build: {time.time()-t0:.1f}s")
        if args.save_index:
            t0 = time.time()
            index.save_to_path(args.save_index)
            log(f"save {args.save_index}: {time.time()-t0:.1f}s")

    dev, packed, row_allowed = index._scan_inputs(None)
    b_pad = 1 << (args.batch - 1).bit_length()
    q_host = np.zeros((b_pad, args.dim), np.float32)
    q_host[: args.batch] = queries
    q_dev = jax.device_put(q_host)
    q_dev.block_until_ready()

    nprobe = args.nprobe
    rerank = args.rerank
    max_tiles = index._fused_max_tiles(nprobe, batch=b_pad)
    probe_k = probe_k_bucket(nprobe, dev.centroids.shape[0])
    n_clusters = int(dev.centroids.shape[0])
    k_sel = n_clusters if probe_k is None else min(probe_k, n_clusters)
    metric, ex_bits = index.metric, index.ex_bits
    d_pad = index.padded_dim
    rotate = index.rotator.rotate
    fa_eff = jnp.where(row_allowed, dev.f_add, BIG)
    log(f"max_tiles={max_tiles} probe_k={probe_k} rerank={rerank}")

    def _prep(q):
        """Mirror of scan_kernel's pre-Pallas section (index/scan.py)."""
        q_rot = rotate(q)
        qc = est_ops.query_constants(q_rot, ex_bits)
        g_add, g_error, sq_dist, _ = est_ops.g_terms(
            q_rot, dev.centroids, metric
        )
        sel = -sq_dist
        ranked_sel, ranked = jax.lax.top_k(sel, k_sel)
        b = q.shape[0]
        within = jnp.broadcast_to(
            jnp.arange(k_sel, dtype=jnp.int32)[None, :] < nprobe, (b, k_sel)
        )
        probe_mask = jnp.zeros((b, n_clusters), jnp.bool_)
        probe_mask = probe_mask.at[jnp.arange(b)[:, None], ranked].max(within)
        order = jnp.argsort(ranked[:, 0])
        inv = jnp.argsort(order)
        return q_rot, qc, g_add, g_error, probe_mask, order, inv

    @jax.jit
    def prep_only(q):
        q_rot, qc, g_add, g_error, probe_mask, order, inv = _prep(q)
        # small outputs that depend on every heavy intermediate
        return (
            jnp.sum(probe_mask, dtype=jnp.int32)
            + jnp.sum(order)
            + jnp.sum(inv),
            jnp.sum(g_add) + jnp.sum(g_error) + jnp.sum(q_rot),
        )

    # NOTE: the >100 MB planes (packed, ex) are jit ARGUMENTS, never
    # closed over — a closed-over device array becomes a compile-time
    # constant that the remote-compile service ships and folds (the
    # CLAUDE.md jit gotcha; an earlier revision closed stage2 over the
    # ~1 GB ex plane and its compile blew a 30-minute timeout).
    @functools.partial(jax.jit)
    def _select(q, packed_a, fa_a, cluster_a, cblk_a):
        q_rot, qc, g_add, g_error, probe_mask, order, inv = _prep(q)
        q_in = q_rot[order] if max_tiles is not None else q_rot
        k1x_in = qc.k1x_sum_q[order] if max_tiles is not None else qc.k1x_sum_q
        g_add_in = g_add[order] if max_tiles is not None else g_add
        g_err_in = g_error[order] if max_tiles is not None else g_error
        probe_in = probe_mask[order] if max_tiles is not None else probe_mask
        cand_idx, cand_ok, probed = fused_select(
            q_in, packed_a, fa_a, dev.f_rescale, dev.f_error, cluster_a,
            k1x_in, g_add_in, g_err_in, probe_in, cblk_a,
            rerank, d_pad,
            int8_stage1=(args.scan_dtype == "fused8"), max_tiles=max_tiles,
        )
        if max_tiles is not None:
            cand_idx, cand_ok = cand_idx[inv], cand_ok[inv]
        return cand_idx, cand_ok

    def select_only(q):
        return _select(q, packed, fa_eff, dev.cluster_of, index._fused_cblk)

    @functools.partial(jax.jit)
    def _stage2(q, cand_idx, cand_ok, ex_a, cluster_a, ids_a):
        q_rot = rotate(q)
        qc = est_ops.query_constants(q_rot, ex_bits)
        g_add, _, _, _ = est_ops.g_terms(q_rot, dev.centroids, metric)
        return _stage2_rerank(
            q_rot, qc, g_add, dev.binary, ex_a, dev.f_add, dev.f_rescale,
            dev.f_add_ex, dev.f_rescale_ex, cluster_a, ids_a,
            cand_idx, cand_ok,
            top_k=10, rerank=cand_idx.shape[1], metric=metric,
            ex_bits=ex_bits, scan_dtype=args.scan_dtype, refine_ex=True,
            clamp_l2=False,
        )

    def stage2_only(q, cand_idx, cand_ok):
        return _stage2(q, cand_idx, cand_ok, dev.ex, dev.cluster_of, dev.ids)

    def full(q):
        return index._fused_scan(
            q, dev.centroids, dev.binary, dev.ex, dev.f_add, dev.f_rescale,
            dev.f_error, dev.f_add_ex, dev.f_rescale_ex, dev.cluster_of,
            row_allowed, dev.ids,
            packed=packed, fused_cblk=index._fused_cblk,
            top_k=10, nprobe=nprobe, rerank=rerank,
            metric=metric, ex_bits=ex_bits, scan_dtype=args.scan_dtype,
            approx_topk=index.approx_topk, max_tiles=max_tiles,
            probe_k=probe_k,
        )

    def timeit(name, fn, *fixed):
        jax.block_until_ready(fn(q_dev, *fixed))  # compile + warm
        t0 = time.time()
        outs = [fn(q_dev, *fixed) for _ in range(args.reps)]
        jax.block_until_ready(outs)
        ms = (time.time() - t0) / args.reps * 1000
        log(f"{name:>12}: {ms:8.2f} ms")
        return ms

    prep_detail = {}
    if args.prep_detail:
        # Cumulative sub-programs (each extends the previous; differences
        # isolate a stage). Tiny reduced outputs keep XLA from dead-code
        # eliminating the heavy intermediates.
        @jax.jit
        def p_rot(q):
            q_rot = rotate(q)
            return jnp.sum(q_rot)

        @jax.jit
        def p_gterms(q):
            q_rot = rotate(q)
            qc = est_ops.query_constants(q_rot, ex_bits)
            g_add, g_error, sq_dist, _ = est_ops.g_terms(
                q_rot, dev.centroids, metric
            )
            return jnp.sum(q_rot) + qc.k1x_sum_q.sum() + g_add.sum() + (
                g_error.sum() + sq_dist.sum()
            )

        @jax.jit
        def p_topk(q):
            q_rot = rotate(q)
            qc = est_ops.query_constants(q_rot, ex_bits)
            g_add, g_error, sq_dist, _ = est_ops.g_terms(
                q_rot, dev.centroids, metric
            )
            ranked_sel, ranked = jax.lax.top_k(-sq_dist, k_sel)
            return jnp.sum(q_rot) + g_add.sum() + g_error.sum() + (
                qc.k1x_sum_q.sum() + ranked_sel.sum() + jnp.sum(ranked)
            )

        @jax.jit
        def p_scatter(q):
            q_rot = rotate(q)
            qc = est_ops.query_constants(q_rot, ex_bits)
            g_add, g_error, sq_dist, _ = est_ops.g_terms(
                q_rot, dev.centroids, metric
            )
            ranked_sel, ranked = jax.lax.top_k(-sq_dist, k_sel)
            b = q.shape[0]
            within = jnp.broadcast_to(
                jnp.arange(k_sel, dtype=jnp.int32)[None, :] < nprobe, (b, k_sel)
            )
            probe_mask = jnp.zeros((b, n_clusters), jnp.bool_)
            probe_mask = probe_mask.at[
                jnp.arange(b)[:, None], ranked
            ].max(within)
            return jnp.sum(q_rot) + g_add.sum() + g_error.sum() + (
                qc.k1x_sum_q.sum() + ranked_sel.sum()
            ) + jnp.sum(probe_mask, dtype=jnp.int32).astype(jnp.float32)

        ms_rot = timeit("rot", p_rot)
        ms_gterms = timeit("rot+gterms", p_gterms)
        ms_topk = timeit("..+topk", p_topk)
        ms_scatter = timeit("..+scatter", p_scatter)
        prep_detail = {
            "rot_ms": round(ms_rot, 2),
            "gterms_ms": round(ms_gterms - ms_rot, 2),
            "topk_ms": round(ms_topk - ms_gterms, 2),
            "scatter_ms": round(ms_scatter - ms_topk, 2),
        }

    ms_prep = timeit("prep", prep_only)
    if args.prep_detail:
        prep_detail["argsort_ms"] = round(ms_prep - ms_scatter, 2)
    ms_select = timeit("prep+select", select_only)
    cand_idx, cand_ok = select_only(q_dev)
    jax.block_until_ready((cand_idx, cand_ok))
    ms_stage2 = timeit("stage2(std)", stage2_only, cand_idx, cand_ok)
    ms_full = timeit("full", full)

    print(
        {
            **prep_detail,
            "prep_ms": round(ms_prep, 2),
            "select_ms": round(ms_select - ms_prep, 2),
            "stage2_by_diff_ms": round(ms_full - ms_select, 2),
            "stage2_standalone_ms": round(ms_stage2 - ms_prep, 2),
            "full_ms": round(ms_full, 2),
        }
    )


if __name__ == "__main__":
    main()
