"""The batched RaBitQ scan kernel — the framework's hot path.

TPU recast of the reference's FastScan candidate scan + heap re-ranking
(lqhl/rabitq-rs ``ivf.rs:1754-2129``), redesigned for the MXU instead of
translated:

* The CPU reference walks nprobe clusters, 32 vectors at a time, estimating
  distances with an i8-LUT + AVX shuffle accumulate (``simd.rs:972-1186``)
  and pruning each vector against a live top-k heap (``ivf.rs:2045-2057``).
* Here, stage 1 computes <binary_code, q> for *every* stored row as one
  dense code-matrix x query-block matmul ([N, D] int8 x [D, B]), assembles
  est/lower_bound with fused element-wise ops, masks rows whose cluster was
  not probed (identical nprobe semantics, evaluated dense), and takes the
  best ``rerank`` rows per query with ``lax.top_k`` — a static-shaped
  survivor set replacing the data-dependent heap.
* Stage 2 gathers the survivors' code rows and re-scores them exactly in
  f32 with the extended-code estimator (``ivf.rs:2086-2099``), then takes
  the final top-k.

Because the MXU computes the binary dot exactly (or with bf16/int8 operand
rounding, selectable), there is no LUT quantization error term: accuracy is
at least the reference's, and the whole batch runs in one XLA program with
no host round-trips.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..types import Metric
from ..ops import estimator as est_ops


def probe_k_bucket(nprobe, n_clusters: int, scan_dtype: str = "fused") -> int | None:
    """Static truncated-ranking size for ``scan_kernel``'s ``probe_k``.

    pow2 buckets (bounded recompiles across sweeps); None (full ranking)
    when nprobe is traced/unknown or close to the cluster count. The
    bucket is >= nprobe by construction, so truncation never drops a
    probed cluster.

    Only the fused path gets a bucket: it already compiles per
    ``max_tiles`` bucket, and truncating its prep stage measured +15%
    end-to-end (BENCHMARKS.md "probe_k"). The dense/bf16/int8/packed
    paths keep ``nprobe`` fully traced — one compiled program per index
    across a whole parameter sweep (the CLAUDE.md invariant) — where the
    centroid ranking is noise next to the all-rows scan anyway."""
    if not is_fused(scan_dtype):
        return None
    if not isinstance(nprobe, (int, np.integer)):
        return None
    k = max(int(nprobe), 1)
    if 2 * k >= n_clusters:
        return None  # ranking nearly everything anyway
    return min(1 << (k - 1).bit_length(), n_clusters)


def is_fused(scan_dtype: str) -> bool:
    """'fused' (bf16 stage-1 operands) or 'fused8' (int8-quantized query
    on the stage-1 MXU dot: 2x MXU throughput, the moral twin of the
    dense path's scan_dtype='int8')."""
    return scan_dtype in ("fused", "fused8")


def ex_plane_is_total(ex_bits: int) -> bool:
    """Whether the refine plane stores TOTAL codes (single-gather re-rank).

    total = ex + (binary << ex_bits) <= 2^(ex_bits+1) - 1 must fit int8
    (<= 127), so this holds only for ex_bits <= 6 (total_bits <= 7). For
    ex_bits == 7 the total reaches 255: raw ex codes are stored instead and
    the two-gather formula is used.
    """
    return 1 <= ex_bits <= 6


def make_refine_plane(binary, ex, ex_bits: int):
    """Build the device refine plane from binary/ex code planes (np or jnp).

    Returns values suitable for an int8 plane when ex_bits <= 7, else the
    raw (int32) ex codes. Shared by every index builder so the
    ex_plane_is_total rule lives in exactly one place.
    """
    if ex_plane_is_total(ex_bits):
        return ex.astype("uint8") + (binary.astype("uint8") << ex_bits)
    return ex


def device_row_permutation(n: int, n_pad: int, seed: int = 0x5EED) -> "np.ndarray":
    """Fixed pseudorandom permutation for the device row layout.

    ``approx_max_k`` reduces within contiguous bins; with cluster-sorted
    rows a query's best candidates are contiguous (same probed cluster) and
    collide in one bin, which silently costs several points of recall.
    Scattering rows uniformly restores the op's iid assumption. Padding
    rows (>= n) stay at the tail.
    """
    import numpy as np

    rng = np.random.default_rng(seed + n)
    perm = np.arange(n_pad, dtype=np.int64)
    perm[:n] = rng.permutation(n)
    return perm


def _stage1_dots(q_rot: jax.Array, codes: jax.Array, scan_dtype: str) -> jax.Array:
    """<code_row, q> for all rows: q_rot [B, D] f32, codes [N, D] int.

    Returns [B, N] f32. ``scan_dtype`` picks the MXU operand precision:
      * "f32"  — exact (reference-oracle path, also used on CPU in tests)
      * "bf16" — bf16 operands, f32 accumulate (<=2^-9 operand rounding;
                 well inside the reference's own i8-LUT error)
      * "int8" — per-query symmetric int8 quantization of q, int8 x int8 ->
                 int32 on the MXU (2x MXU throughput; the moral equivalent
                 of the reference's i8 LUT, ``ivf.rs:822-833``)
    """
    if scan_dtype == "f32":
        return jax.lax.dot_general(
            q_rot,
            codes.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if scan_dtype == "bf16":
        return jax.lax.dot_general(
            q_rot.astype(jnp.bfloat16),
            codes.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if scan_dtype == "int8":
        scale = jnp.max(jnp.abs(q_rot), axis=-1, keepdims=True) / 127.0  # [B, 1]
        scale = jnp.maximum(scale, 1e-30)
        q_i8 = jnp.clip(jnp.round(q_rot / scale), -127, 127).astype(jnp.int8)
        accu = jax.lax.dot_general(
            q_i8,
            codes.astype(jnp.int8),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return accu.astype(jnp.float32) * scale
    raise ValueError(f"unknown scan_dtype: {scan_dtype}")


def gather_rows_bound(cluster_sizes, nprobe: int) -> int:
    """Safe per-QUERY bound on probed rows: the sum of the ``nprobe``
    largest cluster sizes (a query probes exactly ``nprobe`` clusters;
    ε-pruning and filters only shrink the set). Mirrors
    ``probed_tile_bound`` but for the gather scan, which pays per row
    per query instead of per tile per block."""
    sizes = np.sort(np.asarray(cluster_sizes, np.int64))[::-1]
    return int(sizes[: max(int(nprobe), 1)].sum())


def gather_budget_bucket(cluster_sizes, nprobe) -> int | None:
    """Static pow2-bucketed gather budget, or None when the gather scan
    does not apply (traced nprobe: the budget must be static)."""
    if not isinstance(nprobe, (int, np.integer)):
        return None
    bound = gather_rows_bound(cluster_sizes, int(nprobe))
    if bound <= 0:
        return None
    return 1 << (bound - 1).bit_length()


def sort_result_rows(ids: jax.Array, dists: jax.Array):
    """Row-sort a final ``[B, k]`` result block ascending by distance
    (invalid entries carry +inf and land last). Used as a PRESENTATION
    pass after the top-k set has been selected in the kernel's bf16
    order: the exact scan's f32 g_add correction can flip near-ties
    (< g * 2^-9 relative), and users reasonably expect monotone scores.
    Traced (device) op — call inside the dispatching program."""
    order = jnp.argsort(dists, axis=1)
    return (
        jnp.take_along_axis(ids, order, axis=1),
        jnp.take_along_axis(dists, order, axis=1),
    )


_SCAN_STATIC = (
    "top_k",
    "rerank",
    "metric",
    "ex_bits",
    "scan_dtype",
    "use_prune_epsilon",
    "refine_ex",
    "clamp_l2",
    "centroid_select_l2",
    "approx_topk",
    "approx_recall_target",
    "with_diagnostics",
    "max_tiles",
    "probe_k",
    "gather_rows",
    "fused_exact",
    "fused_exact_sort",
    "locality_depth",
)


@functools.partial(jax.jit, static_argnames=_SCAN_STATIC)
def scan_kernel(
    q_rot: jax.Array,  # [B, Dpad] f32 rotated queries
    centroids: jax.Array,  # [C, Dpad] f32 rotated centroids
    binary: jax.Array,  # [Np, Dpad] int8 {0,1}
    # Refine plane. INVARIANT: when ex_plane_is_total(ex_bits) this holds
    # the TOTAL codes (binary << ex_bits | ex, <= 127 so int8 fits) — the
    # extended estimator only needs <total, q>, so the survivor re-rank
    # does ONE gather+dot instead of two. Otherwise it holds raw ex codes
    # and the two-term formula is used.
    ex: jax.Array,
    f_add: jax.Array,  # [Np] f32
    f_rescale: jax.Array,
    f_error: jax.Array,
    f_add_ex: jax.Array,
    f_rescale_ex: jax.Array,
    cluster_of: jax.Array,  # [Np] int32
    row_allowed: jax.Array,  # [Np] bool (valid & user filter)
    ids: jax.Array,  # [Np] int32 original vector ids
    nprobe: jax.Array | int = 1,  # traced: sweeping nprobe does not recompile
    prune_epsilon: jax.Array | float = 0.0,  # traced (MSTG dynamic pruning)
    packed: jax.Array | None = None,  # [Np, Db] uint8 bitplanes ("packed"/"fused")
    fused_cblk: jax.Array | None = None,  # [N_tiles] int32 ("fused" windows)
    cl_starts: jax.Array | None = None,  # [C] int32 first row of each cluster
    cl_sizes: jax.Array | None = None,  # [C] int32 rows per cluster (gather)
    *,
    top_k: int,
    rerank: int,
    metric: Metric,
    ex_bits: int,
    scan_dtype: str,
    use_prune_epsilon: bool = False,
    refine_ex: bool = True,
    clamp_l2: bool = False,
    centroid_select_l2: bool = False,
    approx_topk: bool = True,
    approx_recall_target: float = 0.99,
    with_diagnostics: bool = False,
    max_tiles: int | None = None,
    probe_k: int | None = None,
    gather_rows: int | None = None,
    fused_exact: bool = False,
    fused_exact_sort: bool = True,
    locality_depth: int = 1,
):
    """Returns (result_ids [B, top_k] int32, result_dist [B, top_k] f32).

    Entries past the number of available candidates have id -1 and dist
    +inf (host wrappers trim them). For InnerProduct, ``result_dist`` is
    the internal distance; score = -dist (``ivf.rs:2106-2109``).

    With ``with_diagnostics`` a third output ``diag [B, 3] int32`` is
    returned, MEASURED from the scan's own masks (not synthesized):
    ``[:, 0]`` candidates fully scored and offered to the final top-k
    (``estimated``, ``ivf.rs:2112``), ``[:, 1]`` probed rows pruned by
    the lower-bound survivor cut (``skipped_by_lower_bound``,
    ``ivf.rs:2055``), ``[:, 2]`` extended-code evaluations
    (``ivf.rs:2064``) — survivors re-ranked, 0 when ex_bits == 0 or
    refinement is off.
    """
    b, d = q_rot.shape
    n_rows = ids.shape[0]  # binary may be None (fused + TOTAL refine plane)
    n_clusters = centroids.shape[0]
    nprobe = jnp.clip(jnp.asarray(nprobe, jnp.int32), 1, n_clusters)
    rerank = min(max(rerank, top_k), n_rows)

    qc = est_ops.query_constants(q_rot, ex_bits)  # sums over last axis -> [B]
    g_add, g_error, sq_dist, cent_dot = est_ops.g_terms(q_rot, centroids, metric)

    # --- cluster selection (ivf.rs:1782-1835) ---
    # Rank the top `k_sel` clusters; mark the first `nprobe` as probed.
    # nprobe is a traced scalar, so recall/QPS sweeps reuse one compiled
    # program. `probe_k` (static, wrapper-guaranteed >= nprobe, pow2
    # buckets) truncates the ranking: a full [B, C] sort was ~half the
    # measured device batch at the 1M headline point (24.9 of 52 ms) while
    # nprobe=4 needs only the first handful of ranks.
    if centroid_select_l2 or metric is Metric.L2:
        # MSTG navigates centroids by L2 regardless of the scan metric
        # (mstg/hnsw.rs uses DistL2 unconditionally).
        sel = -sq_dist
    else:
        sel = cent_dot
    k_sel = n_clusters if probe_k is None else min(probe_k, n_clusters)
    nprobe = jnp.minimum(nprobe, k_sel)
    ranked_sel, ranked = jax.lax.top_k(sel, k_sel)  # [B, k_sel] best-first
    within = jnp.broadcast_to(
        jnp.arange(k_sel, dtype=jnp.int32)[None, :] < nprobe, (b, k_sel)
    )
    if use_prune_epsilon:
        # MSTG dynamic pruning (mstg/index.rs:349-362): keep candidates whose
        # centroid L2 *norm* distance <= closest * (1 + epsilon); the
        # reference's candidate distances are sqrt'ed (mstg/hnsw.rs:175-184),
        # so on squared distances the threshold is closest * (1+eps)^2.
        ranked_sq = -ranked_sel  # valid under centroid_select_l2
        closest = ranked_sq[:, :1]
        factor = (1.0 + prune_epsilon) ** 2
        within = within & (ranked_sq <= closest * factor)

    if gather_rows is not None:
        # --- gather scan (OPT-IN; measured 17x slower than the fused
        # bin-scan at 1M because XLA's TPU gather is element-rate-bound —
        # see IvfRabitqIndex._gather_budget): score ONLY the probed
        # clusters' rows, exactly — the TPU restatement of the reference
        # scanning probed clusters alone (ivf.rs:1847-1872), a [B, R, D]
        # code gather + batched dot. No bins, no survivor cut: every
        # probed row is scored with the full-precision total-code
        # estimator, so accuracy is >= every other path's.
        assert cl_starts is not None and cl_sizes is not None, (
            "gather_rows needs the cluster row ranges"
        )
        assert ex_bits > 0 and refine_ex and ex_plane_is_total(ex_bits), (
            "gather scan requires the TOTAL refine plane (ex_bits in 1..6)"
        )
        return _gather_scan(
            q_rot, qc, g_add, ranked, within, cl_starts, cl_sizes,
            ex, f_add_ex, f_rescale_ex, row_allowed, ids,
            top_k=top_k, metric=metric, scan_dtype=scan_dtype,
            clamp_l2=clamp_l2, gather_rows=gather_rows,
            with_diagnostics=with_diagnostics,
        )

    probe_mask = jnp.zeros((b, n_clusters), jnp.bool_)
    probe_mask = probe_mask.at[jnp.arange(b)[:, None], ranked].max(within)

    if is_fused(scan_dtype):
        # Fully fused Pallas stage-1 + selection (ops/pallas_fused_scan.py):
        # no [B, N] tensor is ever materialized — the per-cluster g-terms
        # expand in-kernel over cluster-sorted rows and survivors come from
        # an in-VMEM bin accumulator. Masks fold into VALUES (BIG sentinel):
        # rows outside the filter via f_add, unprobed clusters via g_add.
        from ..ops.pallas_fused_scan import BIG, fused_select

        assert fused_cblk is not None, (
            "scan_dtype='fused' needs the c_blk windows"
        )
        if fused_exact and (ex is None or ex.shape[1] % 128 != 0):
            # defensive: exact mode needs the 128-lane-aligned refine
            # plane the shared layout provides; planes from other
            # builders fall back to the two-stage scan (shape is static,
            # so this is a trace-time branch)
            fused_exact = False
        if fused_exact:
            # --- exact in-kernel scan: stream the dense int8 TOTAL plane
            # with the EXTENDED factors (f_error := 0, so the in-kernel
            # g-term reduces to g_add and the bin values are exactly
            # est_extended, ivf.rs:2086-2099). Bin minima are final
            # distances: the stage-2 survivor gather — measured the
            # dominant term of the serving dispatch (BENCHMARKS.md
            # "Gather rate") — disappears entirely. Selection loss is a
            # bin COLLISION between two true top-k rows (~L/k^2 odds),
            # absorbed the same way approx_max_k's stripe-min is.
            assert ex_plane_is_total(ex_bits) and refine_ex, (
                "fused_exact needs the TOTAL refine plane"
            )
            plane = ex
            fa_eff = jnp.where(row_allowed, f_add_ex, BIG)
            fr_in, fe_in = f_rescale_ex, jnp.zeros_like(f_error)
            k1x_full = qc.kbx_sum_q
        else:
            assert packed is not None, (
                "scan_dtype='fused' needs the packed plane"
            )
            plane = packed
            fa_eff = jnp.where(row_allowed, f_add, BIG)
            fr_in, fe_in = f_rescale, f_error
            k1x_full = qc.k1x_sum_q
        q_in, k1x_in, g_add_in, g_err_in, probe_in = (
            q_rot, k1x_full, g_add, g_error, probe_mask,
        )
        inv = None
        if max_tiles is not None:
            # Block-locality sort: queries whose best centroid is the same
            # land in the same kernel query tile, shrinking each block's
            # probed-cluster union and therefore its compacted tile list.
            # Results are inverse-permuted back — per-query output is
            # order-independent. locality_depth=2 keys on the top TWO
            # ranked centroids (lexicographic via a composite int32 key),
            # grouping ties on the best centroid by their second probe.
            if locality_depth >= 2 and ranked.shape[1] >= 2:
                key = ranked[:, 0] * jnp.int32(n_clusters) + ranked[:, 1]
                order = jnp.argsort(key)
            else:
                order = jnp.argsort(ranked[:, 0])
            inv = jnp.argsort(order)
            q_in = q_rot[order]
            k1x_in = k1x_full[order]
            g_add_in = g_add[order]
            g_err_in = g_error[order]
            probe_in = probe_mask[order]
        if fused_exact and plane.shape[1] != q_in.shape[1]:
            # fused layouts width-pad the refine plane to 128 lanes
            # (layout.py); zero query columns keep the dot unchanged
            q_in = jnp.pad(
                q_in, ((0, 0), (0, plane.shape[1] - q_in.shape[1]))
            )
        sel_out = fused_select(
            q_in,
            plane,
            fa_eff,
            fr_in,
            fe_in,
            cluster_of,
            k1x_in,
            g_add_in,
            g_err_in,
            probe_in,
            fused_cblk,
            top_k if fused_exact else rerank,
            d,
            # exact mode keeps bf16 query operands: its dot produces the
            # FINAL scores (stage-2 precision, 2^-9 q rounding), whereas
            # the two-stage int8 dot only feeds a survivor cut that an
            # exact re-rank absorbs
            int8_stage1=(scan_dtype == "fused8") and not fused_exact,
            max_tiles=max_tiles,
            direct_plane=fused_exact,
            with_values=fused_exact,
        )
        if fused_exact:
            cand_idx, cand_ok, cand_val, probed = sel_out
        else:
            cand_idx, cand_ok, probed = sel_out
        if inv is not None:
            cand_idx = cand_idx[inv]
            cand_ok = cand_ok[inv]
            probed = probed[inv]
            if fused_exact:
                cand_val = cand_val[inv]
        if fused_exact:
            # bin minima ARE the final distances. g_add entered the kernel
            # as bf16 (the larger rounding term for L2 — the q operand's
            # 2^-9 is the other); restore the f32 g_add on the RETURNED
            # values with a per-(query, cluster) correction so
            # user-visible distances carry stage-2 precision. The top_k
            # SET stays the kernel's bf16 order (selecting by corrected
            # values would let the no-replica fast path — extracting
            # top_k — and the dedup path — extracting rerank-wide —
            # disagree at sub-2^-9 tie boundaries; tests pin their exact
            # agreement). Presentation order is then fixed up by a final
            # row-sort on the corrected values (``fused_exact_sort``,
            # disabled by the MSTG dedup caller whose ``_dedup_topk_device``
            # sorts after its own top_k selection instead).
            g_corr = g_add - g_add.astype(jnp.bfloat16).astype(jnp.float32)
            corr = jnp.take_along_axis(
                g_corr, jnp.take(cluster_of, jnp.maximum(cand_idx, 0)), axis=1
            )
            cand_val = cand_val + jnp.where(cand_ok, corr, 0.0)
            result_dist = jnp.where(
                cand_ok & jnp.isfinite(cand_val), cand_val, jnp.inf
            )
            if clamp_l2 and metric is Metric.L2:
                result_dist = jnp.where(
                    jnp.isfinite(result_dist),
                    jnp.maximum(result_dist, 0.0),
                    result_dist,
                )
            result_ids = jnp.where(
                jnp.isfinite(result_dist),
                jnp.take(ids, cand_idx),
                jnp.int32(-1),
            )
            k = result_ids.shape[1]
            if k < top_k:
                pad = top_k - k
                result_ids = jnp.pad(
                    result_ids, ((0, 0), (0, pad)), constant_values=-1
                )
                result_dist = jnp.pad(
                    result_dist, ((0, 0), (0, pad)), constant_values=jnp.inf
                )
            result_ids = result_ids[:, :top_k]
            result_dist = result_dist[:, :top_k]
            if fused_exact_sort:
                result_ids, result_dist = sort_result_rows(
                    result_ids, result_dist
                )
            result = (result_ids, result_dist)
        else:
            rerank = cand_idx.shape[1]
            result = _stage2_rerank(
                q_rot, qc, g_add, binary, ex, f_add, f_rescale, f_add_ex,
                f_rescale_ex, cluster_of, ids, cand_idx, cand_ok,
                top_k=top_k, rerank=rerank, metric=metric, ex_bits=ex_bits,
                scan_dtype=scan_dtype, refine_ex=refine_ex, clamp_l2=clamp_l2,
            )
        if not with_diagnostics:
            return result
        # counters measured INSIDE the production kernel: `probed` is the
        # offered-row count from the bin accumulator (ivf.rs:150-155).
        # In exact mode every offered row is scored at full precision:
        # estimated == probed, none skipped by a lower-bound cut.
        if fused_exact:
            diag = jnp.stack(
                [probed, jnp.zeros_like(probed), probed], axis=1
            )
            return (*result, diag)
        survivors = jnp.sum(cand_ok, axis=1, dtype=jnp.int32)
        extended = (
            survivors if (ex_bits > 0 and refine_ex) else jnp.zeros_like(survivors)
        )
        diag = jnp.stack([survivors, probed - survivors, extended], axis=1)
        return (*result, diag)

    # --- stage 1: dense 1-bit estimate for every row ---
    # bf16 gathers: these [B, Np] planes are pure HBM traffic; g-term
    # magnitudes are distances, so 2^-9 relative rounding is far below the
    # quantization error. The f32 oracle path keeps full precision.
    g_dtype = jnp.float32 if scan_dtype == "f32" else jnp.bfloat16
    g_add_rows = jnp.take(g_add.astype(g_dtype), cluster_of, axis=1)  # [B, Np]
    g_err_rows = jnp.take(g_error.astype(g_dtype), cluster_of, axis=1)
    allowed = jnp.take(probe_mask, cluster_of, axis=1) & row_allowed[None, :]
    if scan_dtype == "packed":
        # fused Pallas kernel over 1-bit/dim packed codes: 8x less code
        # traffic and no [B, N] int32 accumulator in HBM (ops/pallas_scan.py)
        from ..ops.pallas_scan import packed_lb_scan, permute_query

        assert packed is not None, "scan_dtype='packed' requires the packed plane"
        q_perm = permute_query(q_rot, d)
        g_comb = (g_add_rows - f_error[None, :] * g_err_rows).astype(jnp.bfloat16)
        lb16 = packed_lb_scan(
            packed, q_perm, f_add, f_rescale, qc.k1x_sum_q, g_comb
        )
        lb_f = lb16.astype(jnp.float32)
        # non-finite -> never prune, exactly like the dense path below
        lb_f = jnp.where(jnp.isfinite(lb_f), lb_f, -jnp.inf)
        masked_lb = jnp.where(allowed, lb_f, jnp.inf)
    else:
        assert binary is not None, "dense scan needs the binary plane"
        bdot = _stage1_dots(q_rot, binary, scan_dtype)  # [B, Np]
        est = est_ops.est_1bit(
            f_add[None, :], g_add_rows, f_rescale[None, :], bdot, qc.k1x_sum_q[:, None]
        )
        lb = est_ops.lower_bound(est, f_error[None, :], g_err_rows)
        # Non-finite lower bounds fall back to "never prune" (ivf.rs:2031-2042).
        lb = jnp.where(jnp.isfinite(lb), lb, -jnp.inf)
        masked_lb = jnp.where(allowed, lb, jnp.inf)

    # --- survivor selection (static-shape replacement of the heap prune) ---
    # TPU's native approximate top-k (MIPS TPU paper op) is ~5x faster than
    # the exact sort-based top_k on [B, N]; the survivors feed an exact
    # re-rank + exact final top-k, so per-element 0.95 recall on a 40x
    # over-provisioned survivor set costs ~nothing end to end. Exact
    # selection remains available (approx_topk=False) and is used by the
    # parity tests.
    if approx_topk:
        # bf16 halves the [B, N] buffer feeding the selection — the largest
        # HBM tensor in the scan; survivors are re-ranked exactly afterwards
        neg_lb, cand_idx = jax.lax.approx_max_k(
            (-masked_lb).astype(jnp.bfloat16), rerank,
            recall_target=approx_recall_target,
        )
        neg_lb = neg_lb.astype(jnp.float32)
    else:
        neg_lb, cand_idx = jax.lax.top_k(-masked_lb, rerank)  # [B, R]
    cand_ok = neg_lb > -jnp.inf

    result_ids, result_dist = _stage2_rerank(
        q_rot, qc, g_add, binary, ex, f_add, f_rescale, f_add_ex,
        f_rescale_ex, cluster_of, ids, cand_idx, cand_ok,
        top_k=top_k, rerank=rerank, metric=metric, ex_bits=ex_bits,
        scan_dtype=scan_dtype, refine_ex=refine_ex, clamp_l2=clamp_l2,
    )
    if not with_diagnostics:
        return result_ids, result_dist
    probed = jnp.sum(allowed, axis=1, dtype=jnp.int32)  # 1-bit estimates computed
    survivors = jnp.sum(cand_ok, axis=1, dtype=jnp.int32)  # passed the cut
    extended = survivors if (ex_bits > 0 and refine_ex) else jnp.zeros_like(survivors)
    diag = jnp.stack([survivors, probed - survivors, extended], axis=1)
    return result_ids, result_dist, diag


def _gather_scan(
    q_rot, qc, g_add, ranked, within, cl_starts, cl_sizes,
    ex_total, f_add_ex, f_rescale_ex, row_allowed, ids,
    *, top_k, metric, scan_dtype, clamp_l2, gather_rows, with_diagnostics,
):
    """Exact scoring of every probed row via a per-query row gather.

    ``ranked`` [B, k_sel] best-first cluster ids, ``within`` [B, k_sel]
    the probed mask (nprobe prefix ∩ ε-pruning). Each query's probed
    clusters' row ranges are flattened into a static-width [B, R] row-id
    matrix (R = ``gather_rows``, a safe pow2 bound from
    :func:`gather_rows_bound` — slots past a query's actual probed rows
    are masked, never dropped), then one [B, R, D] gather of the TOTAL
    code plane + a batched dot scores everything with the extended
    estimator (``ivf.rs:2086-2099``) and a final top-k replaces the heap.
    """
    b = q_rot.shape[0]
    r_idx = jnp.arange(gather_rows, dtype=jnp.int32)
    seg_len = jnp.where(within, jnp.take(cl_sizes, ranked), 0)  # [B, k_sel]
    cum = jnp.cumsum(seg_len, axis=1)  # [B, k_sel] inclusive
    total_rows = cum[:, -1]  # [B]
    # segment of each output slot: first cum[] strictly greater than slot
    seg = jax.vmap(
        lambda c: jnp.searchsorted(c, r_idx, side="right")
    )(cum).astype(jnp.int32)
    seg = jnp.minimum(seg, cum.shape[1] - 1)
    cluster = jnp.take_along_axis(ranked, seg, axis=1)  # [B, R]
    prev = jnp.where(
        seg > 0,
        jnp.take_along_axis(cum, jnp.maximum(seg - 1, 0), axis=1),
        0,
    )
    valid = r_idx[None, :] < total_rows[:, None]
    row = jnp.take(cl_starts, cluster) + (r_idx[None, :] - prev)
    row = jnp.where(valid, row, 0)

    op_dtype = jnp.float32 if scan_dtype == "f32" else jnp.bfloat16
    codes = jnp.take(ex_total, row, axis=0)  # [B, R, D]
    q_t = q_rot
    if codes.shape[-1] != q_t.shape[-1]:  # width-padded plane (layout.py)
        q_t = jnp.pad(q_t, ((0, 0), (0, codes.shape[-1] - q_t.shape[-1])))
    tdot = jnp.einsum(
        "brd,bd->br",
        codes.astype(op_dtype),
        q_t.astype(op_dtype),
        preferred_element_type=jnp.float32,
    )
    g_add_r = jnp.take_along_axis(g_add, cluster, axis=1)
    dist = (
        jnp.take(f_add_ex, row)
        + g_add_r
        + jnp.take(f_rescale_ex, row) * (tdot + qc.kbx_sum_q[:, None])
    )
    ok = valid & jnp.take(row_allowed, row)
    dist = jnp.where(ok & jnp.isfinite(dist), dist, jnp.inf)

    k = min(top_k, gather_rows)
    neg_d, pos = jax.lax.top_k(-dist, k)
    result_dist = -neg_d
    if clamp_l2 and metric is Metric.L2:
        result_dist = jnp.where(
            jnp.isfinite(result_dist), jnp.maximum(result_dist, 0.0), result_dist
        )
    result_rows = jnp.take_along_axis(row, pos, axis=1)
    result_ids = jnp.where(
        jnp.isfinite(result_dist), jnp.take(ids, result_rows), jnp.int32(-1)
    )
    if k < top_k:
        pad = top_k - k
        result_ids = jnp.pad(result_ids, ((0, 0), (0, pad)), constant_values=-1)
        result_dist = jnp.pad(
            result_dist, ((0, 0), (0, pad)), constant_values=jnp.inf
        )
    if not with_diagnostics:
        return result_ids, result_dist
    # every offered row is scored exactly: estimated == extended, none
    # skipped by a lower-bound cut (there is no cut on this path)
    estimated = jnp.sum(ok, axis=1, dtype=jnp.int32)
    diag = jnp.stack([estimated, jnp.zeros_like(estimated), estimated], axis=1)
    return result_ids, result_dist, diag


def _stage2_rerank(
    q_rot, qc, g_add, binary, ex, f_add, f_rescale, f_add_ex, f_rescale_ex,
    cluster_of, ids, cand_idx, cand_ok,
    *, top_k, rerank, metric, ex_bits, scan_dtype, refine_ex, clamp_l2,
):
    """High-precision re-rank of survivors + final top-k
    (``ivf.rs:2060-2099``), shared by the dense-XLA and fused-Pallas
    stage-1 paths.

    Integer codes <= 127 are EXACT in bf16, so bf16 operands with f32
    accumulation only round the query (2^-9 relative — far below the
    quantization error and the reference's own i8-LUT stage); it halves
    the conversion buffer feeding the MXU. The f32 oracle config keeps
    full f32 operands.
    """
    op_dtype = jnp.float32 if scan_dtype == "f32" else jnp.bfloat16

    def _dot(codes_gathered, q):
        if codes_gathered.shape[-1] != q.shape[-1]:
            # width-padded refine plane (layout.py): zero q columns
            q = jnp.pad(
                q, ((0, 0), (0, codes_gathered.shape[-1] - q.shape[-1]))
            )
        return jnp.einsum(
            "brd,bd->br",
            codes_gathered.astype(op_dtype),
            q.astype(op_dtype),
            preferred_element_type=jnp.float32,
        )

    g_add_c = jnp.take_along_axis(g_add, jnp.take(cluster_of, cand_idx), axis=1)
    ex_is_total = ex_plane_is_total(ex_bits)
    if ex_bits > 0 and refine_ex and ex_is_total:
        # single gather: <total, q> == binary_scale * bdot + edot exactly
        t_cand = jnp.take(ex, cand_idx, axis=0)  # [B, R, D]
        tdot_c = _dot(t_cand, q_rot)
        total_term = tdot_c + qc.kbx_sum_q[:, None]
        dist = (
            jnp.take(f_add_ex, cand_idx)
            + g_add_c
            + jnp.take(f_rescale_ex, cand_idx) * total_term
        )
    elif ex_bits > 0 and refine_ex:
        assert binary is not None, "two-gather refine needs the binary plane"
        bdot_c = _dot(jnp.take(binary, cand_idx, axis=0), q_rot)
        edot_c = jnp.take(ex, cand_idx, axis=0).astype(jnp.float32)
        q_e = q_rot
        if edot_c.shape[-1] != q_e.shape[-1]:  # width-padded plane
            q_e = jnp.pad(q_e, ((0, 0), (0, edot_c.shape[-1] - q_e.shape[-1])))
        edot_c = jnp.einsum("brd,bd->br", edot_c, q_e)  # may exceed 127: f32
        dist = est_ops.est_extended(
            jnp.take(f_add_ex, cand_idx),
            g_add_c,
            jnp.take(f_rescale_ex, cand_idx),
            bdot_c,
            edot_c,
            qc.binary_scale,
            qc.kbx_sum_q[:, None],
        )
    else:
        assert binary is not None, "1-bit re-score needs the binary plane"
        bdot_c = _dot(jnp.take(binary, cand_idx, axis=0), q_rot)
        dist = est_ops.est_1bit(
            jnp.take(f_add, cand_idx),
            g_add_c,
            jnp.take(f_rescale, cand_idx),
            bdot_c,
            qc.k1x_sum_q[:, None],
        )
    dist = jnp.where(cand_ok & jnp.isfinite(dist), dist, jnp.inf)

    # --- final top-k ---
    k = min(top_k, rerank)
    neg_d, pos = jax.lax.top_k(-dist, k)
    result_dist = -neg_d
    if clamp_l2 and metric is Metric.L2:
        # MSTG clamps small negative L2 estimates to 0 (mstg/index.rs:322-327).
        # Unlike the reference we clamp after ranking: clamping first turns
        # every negative estimate into a 0.0 tie and scrambles their order.
        result_dist = jnp.where(
            jnp.isfinite(result_dist), jnp.maximum(result_dist, 0.0), result_dist
        )
    result_rows = jnp.take_along_axis(cand_idx, pos, axis=1)
    result_ids = jnp.where(
        jnp.isfinite(result_dist), jnp.take(ids, result_rows), jnp.int32(-1)
    )
    if k < top_k:  # tiny indices: pad out to the requested k
        pad = top_k - k
        result_ids = jnp.pad(result_ids, ((0, 0), (0, pad)), constant_values=-1)
        result_dist = jnp.pad(result_dist, ((0, 0), (0, pad)), constant_values=jnp.inf)
    return result_ids, result_dist


def pack_int4_queries(q: np.ndarray):
    """Host-side int4 query encoding: symmetric per-query scale to
    [-7, 7], two dims packed per byte (lo nibble = even dim, hi = odd —
    the exact inverse of ``make_fused_search``'s device decode). Returns
    (packed uint8 [B, ceil(dim/2)], scale f32 [B]). 8x fewer upload
    bytes than f32; ~7% max-coordinate rounding — see BENCHMARKS.md
    "int4 query uploads" for the measured recall cost."""
    b, dim = q.shape
    scale = np.maximum(np.abs(q).max(axis=1), 1e-30) / 7.0
    qi = np.clip(np.rint(q / scale[:, None]), -7, 7).astype(np.int8)
    if dim % 2:
        qi = np.concatenate([qi, np.zeros((b, 1), np.int8)], axis=1)
    lo = qi[:, 0::2] & 0x0F
    hi = (qi[:, 1::2] & 0x0F) << 4
    return (lo | hi).astype(np.uint8), scale.astype(np.float32)


def make_fused_search(rotate_fn, dim: int | None = None):
    """One jitted program per index: rotation fused into the scan.

    The reference rotates inside search (``ivf.rs:1776``); round 1 ran
    rotation and scan as two separate device programs, which behind this
    environment's ~35-40 ms-per-dispatch TPU tunnel set a two-round-trip
    single-query latency floor. Fusing them (the rotator's sign vectors /
    matrix are closed-over constants) serves a search in ONE dispatch.

    ``rotate_fn`` maps raw queries ``[B, dim] -> [B, Dpad]``; pass None
    for indexes that quantize in the original space (MSTG default).
    ``dim`` (the raw query width) is required to decode int4-packed
    query uploads (two dims per byte — the packed array's width alone is
    ambiguous for odd dims).
    """

    @functools.partial(
        jax.jit, static_argnames=_SCAN_STATIC + ("sub_block",)
    )
    def fused(q, *args, qscale=None, offset=None, sub_block=None, **kwargs):
        # accept bf16 (half), symmetric-int8 (quarter) or packed-int4
        # (eighth) query uploads (index.upload_dtype): fewer bytes over
        # the host link; all math stays f32 from here on. int8/int4 carry
        # a per-query scale; int4 arrives as uint8 nibble PAIRS
        # (lo nibble = even dim, hi = odd), sign-extended on device.
        if sub_block is not None:
            # superblock serving: q is an UPLOAD block of many compute
            # blocks resident on device; each dispatch scans the
            # sub_block-query window at (traced) offset. Decouples put
            # granularity from dispatch granularity — the tunnel's
            # per-put overhead amortizes over the whole superblock.
            q = jax.lax.dynamic_slice_in_dim(q, offset, sub_block, axis=0)
            if qscale is not None:
                qscale = jax.lax.dynamic_slice_in_dim(
                    qscale, offset, sub_block, axis=0
                )
        if q.dtype == jnp.uint8:  # int4-packed pairs
            assert dim is not None, "int4 uploads need make_fused_search(dim=)"
            b8 = q.astype(jnp.int8)
            lo = jnp.right_shift(jnp.left_shift(b8, 4), 4)  # arithmetic
            hi = jnp.right_shift(b8, 4)
            q = jnp.stack([lo, hi], axis=-1).reshape(q.shape[0], -1)[:, :dim]
        q = q.astype(jnp.float32)
        if qscale is not None:
            q = q * qscale[:, None]
        q_rot = rotate_fn(q) if rotate_fn is not None else q
        return scan_kernel(q_rot, *args, **kwargs)

    return fused
