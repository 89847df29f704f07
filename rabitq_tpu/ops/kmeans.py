"""K-means clustering on device.

Faiss-style sampled Lloyd iterations, following the reference pipeline
(lqhl/rabitq-rs ``src/kmeans.rs``): training-set subsampling capped at
``max_points_per_centroid`` (``kmeans.rs:210-226``), GEMM-based assignment
in row blocks (``kmeans.rs:439-547``), empty-cluster reseeding from
far-point candidates (``kmeans.rs:564-602``), multi-restart by objective
(``kmeans.rs:104-183``) and optional spherical normalization
(``kmeans.rs:352-367``).

TPU-first deviations from the reference:

* init is k-means++ (D^2 sampling) instead of random Forgy — Forgy
  regularly lands two seeds in one natural cluster, a local optimum Lloyd
  cannot escape (empty-cluster reseeding never fires on it);
* the whole Lloyd loop — init, blockwise MXU assignment, segment-sum
  update, on-device empty-cluster reseed — is ONE jitted program
  (``lax.fori_loop``), not a host loop: a full k-means run is a single
  dispatch, which matters when device dispatch has tunnel latency;
* padded rows are routed to a scratch segment k and dropped, so no host
  fix-up of counts is needed.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

RESEED_CANDIDATES = 8  # kmeans.rs:9
DEFAULT_MAX_POINTS_PER_CENTROID = 256  # kmeans.rs:10


@dataclass
class KMeansResult:
    centroids: np.ndarray  # [k, D] f32
    assignments: np.ndarray  # [N] int32
    objective: float
    iters: int = 0  # Lloyd iterations actually run (< niter on early stop)
    report: dict | None = None  # phase timings {init_s, lloyd_s, assign_s}


def auto_assign_dtype(n: int, dim: int, threshold_elems: int = 1 << 26) -> str:
    """Resolve the builds' ``"auto"`` k-means dtype policy: bf16 MXU
    operands once the dataset passes ~64M elements (256 MB f32 — where
    the assignment matmuls dominate build wall-clock), f32 below (tiny
    runs stay bit-identical to the numpy oracles the tests compare)."""
    return "bf16" if n * dim >= threshold_elems else "f32"


def _matmul_dtype(assign_dtype: str):
    """MXU operand dtype for assignment dots. ``bf16`` runs the MXU at
    native rate (~3x the f32 emulation) — distances are only compared
    against each other for an argmin, so the 2^-9 operand rounding moves
    a negligible sliver of boundary points between clusters (measured
    recall-neutral at the 1M bench, BENCHMARKS.md round-5 k-means)."""
    if assign_dtype == "bf16":
        return jnp.bfloat16
    if assign_dtype == "f32":
        return jnp.float32
    raise ValueError(f"unknown assign_dtype {assign_dtype!r}")


def _block_size(k: int) -> int:
    # Keep the [block, k] distance tile around <=64 MB. Power of two so
    # pow2-padded row counts always tile evenly (bounded compile count).
    raw = int(max(256, min(32768, (1 << 24) // max(k, 1))))
    return 1 << (raw.bit_length() - 1)


def _pad_pow2(n: int, floor: int = 256) -> int:
    """Round up to a power of two (>= floor). Shape bucketing: behind a
    remote-compile tunnel every distinct array shape costs a 10-120 s
    compile, and hierarchical-clustering splits produce hundreds of
    distinct sizes — pow2 buckets bound that to ~log2(N) programs."""
    p = floor
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("block", "assign_dtype"))
def _assign_blocks(
    data: jax.Array, centroids: jax.Array, block: int, assign_dtype: str = "f32"
):
    """Blockwise nearest-centroid assignment.

    data [N, D] (N a multiple of ``block``), centroids [k, D]. Returns
    (assignments [N] int32, min_dists [N] f32). Distance is the clamped
    expansion ||x||^2 + ||c||^2 - 2 x.c (``kmeans.rs:496-507``);
    ``assign_dtype="bf16"`` runs the dot with bf16 MXU operands
    (norms stay f32 — see :func:`_matmul_dtype`).
    """
    n, d = data.shape
    op = _matmul_dtype(assign_dtype)
    c_norm = jnp.sum(centroids * centroids, axis=-1)  # [k]
    ct = centroids.T.astype(op)  # [D, k]

    def one_block(xb):
        dot = jnp.dot(
            xb.astype(op), ct, preferred_element_type=jnp.float32
        )  # [block, k]
        x_norm = jnp.sum(xb * xb, axis=-1, keepdims=True)
        dist = jnp.maximum(x_norm + c_norm[None, :] - 2.0 * dot, 0.0)
        best = jnp.argmin(dist, axis=-1)
        return best.astype(jnp.int32), jnp.min(dist, axis=-1)

    blocks = data.reshape(n // block, block, d)
    assign, dists = jax.lax.map(one_block, blocks)
    return assign.reshape(n), dists.reshape(n)


@functools.partial(jax.jit, static_argnames=("block", "assign_dtype"))
def _grouped_assign_blocks(
    data: jax.Array,  # [N, D] (N a multiple of block)
    centroids: jax.Array,  # [C, D] children of MANY parent clusters
    cent_group: jax.Array,  # [C] int32 parent-group id per centroid
    row_group: jax.Array,  # [N] int32 parent-group id per row (-1: not split)
    block: int,
    assign_dtype: str = "f32",
):
    """Group-restricted nearest-centroid assignment: each row only
    considers centroids whose ``cent_group`` equals its ``row_group``.

    One program assigns EVERY cluster being split this level — the
    hierarchical-clustering recursion compiles O(levels) programs instead
    of one ``assign_dataset`` shape per split (each distinct shape costs a
    10-120 s compile behind the remote-compile tunnel).
    """
    n, d = data.shape
    op = _matmul_dtype(assign_dtype)
    c_norm = jnp.sum(centroids * centroids, axis=-1)  # [C]
    ct = centroids.T.astype(op)

    def one_block(args):
        xb, gb = args
        dot = jnp.dot(
            xb.astype(op), ct, preferred_element_type=jnp.float32
        )  # [block, C]
        x_norm = jnp.sum(xb * xb, axis=-1, keepdims=True)
        dist = jnp.maximum(x_norm + c_norm[None, :] - 2.0 * dot, 0.0)
        ok = gb[:, None] == cent_group[None, :]
        dist = jnp.where(ok, dist, jnp.inf)
        return jnp.argmin(dist, axis=-1).astype(jnp.int32)

    blocks = data.reshape(n // block, block, d)
    gblocks = row_group.reshape(n // block, block)
    assign = jax.lax.map(one_block, (blocks, gblocks))
    return assign.reshape(n)


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(data: jax.Array, key: jax.Array, k: int, n_valid) -> jax.Array:
    """k-means++ (D^2-weighted) seeding, entirely on device.

    ``data`` [N, D] (rows >= n_valid are padding and excluded). One
    fori_loop: each step scores distances to the last chosen centroid, folds
    them into the running min-distance, and samples the next centroid by
    inverse-CDF over that distribution.
    """
    n, d = data.shape
    valid = jnp.arange(n) < n_valid
    first = jax.random.randint(key, (), 0, n_valid)
    centroids0 = jnp.zeros((k, d), jnp.float32).at[0].set(data[first])
    min_d2_0 = jnp.full((n,), jnp.inf, jnp.float32)

    def body(i, carry):
        centroids, min_d2 = carry
        c = centroids[i - 1]
        d2 = jnp.sum(data * data, axis=-1) - 2.0 * (data @ c) + jnp.sum(c * c)
        min_d2 = jnp.minimum(min_d2, jnp.maximum(d2, 0.0))
        w = jnp.where(valid, min_d2, 0.0)
        cum = jnp.cumsum(w)
        total = cum[-1]
        u = jax.random.uniform(jax.random.fold_in(key, i)) * total
        idx = jnp.clip(jnp.searchsorted(cum, u), 0, n_valid - 1)
        idx = jnp.where(total > 0, idx, first)
        return centroids.at[i].set(data[idx]), min_d2

    centroids, _ = jax.lax.fori_loop(1, k, body, (centroids0, min_d2_0))
    return centroids


@functools.partial(
    jax.jit, static_argnames=("k", "block", "spherical", "assign_dtype")
)
def _lloyd_step(
    data: jax.Array,  # [N_pad, D], rows >= n_valid are padding
    centroids: jax.Array,
    k: int,
    block: int,
    n_valid,  # traced: varying cluster sizes must not recompile
    spherical: bool,
    assign_dtype: str = "f32",
):
    """One Lloyd iteration on device: blockwise assignment, segment-sum
    update, empty-cluster reseed from far points (``kmeans.rs:564-602``).
    Returns (new_centroids, objective) — the objective (sum of min sq
    dists against the INPUT centroids) drives the early stop.

    Jitted per-step (not one fused niter-long program): the carry stays on
    device between dispatches, and the much smaller program compiles ~10x
    faster on a remote-compile backend while the per-step dispatch cost is
    negligible against the compute.
    """
    n, d = data.shape
    row_valid = jnp.arange(n) < n_valid
    assign, dists = _assign_blocks(data, centroids, block, assign_dtype)
    assign = jnp.where(row_valid, assign, k)  # padding -> scratch segment
    objective = jnp.sum(jnp.where(row_valid, dists, 0.0), dtype=jnp.float32)
    sums = jax.ops.segment_sum(data, assign, num_segments=k + 1)[:k]
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.float32), assign, num_segments=k + 1
    )[:k]
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    empty = counts == 0
    far_d = jnp.where(row_valid, dists, -jnp.inf)
    _, far_idx = jax.lax.top_k(far_d, RESEED_CANDIDATES)
    rank = jnp.clip(jnp.cumsum(empty.astype(jnp.int32)) - 1, 0, RESEED_CANDIDATES - 1)
    reseed = data[far_idx[rank]]
    new_c = jnp.where(empty[:, None], reseed, new_c)
    if spherical:
        norms = jnp.linalg.norm(new_c, axis=-1, keepdims=True)
        new_c = jnp.where(norms > 0, new_c / jnp.maximum(norms, 1e-30), new_c)
    return new_c, objective


def _init_rows_cap(k: int, n: int) -> int:
    """Row budget for the k-means++ init pass. The init is k sequential
    bandwidth-bound matvec steps over the candidate rows — on the full
    training set it rivals the Lloyd loop itself (measured ~linear in
    rows x k) — while seeding quality saturates far below 256 rows per
    centroid. 64/centroid (>= 65536) keeps the seeds statistically
    indistinguishable and cuts the init pass ~4x at the 1M/4096 build."""
    return max(min(64 * k, n), min(n, 65_536))


def _kmeans_device(
    data: jax.Array,
    key: jax.Array,
    k: int,
    niter: int,
    block: int,
    n_valid: int,
    spherical: bool,
    assign_dtype: str = "f32",
    tol: float = 0.0,
    timings: dict | None = None,
) -> jax.Array:
    """k-means++ init + Lloyd steps; carry stays device-resident.

    ``tol > 0`` stops early when the relative objective improvement of a
    Lloyd step falls below ``tol`` (the reference iterates a fixed count,
    ``kmeans.rs:291``; converged runs just re-confirm the assignment).
    The objective check fetches one scalar per step with one step of
    lookahead enqueued, so the device never idles waiting on the host.
    """
    import time as _time

    t0 = _time.perf_counter()
    init_rows = _init_rows_cap(k, n_valid)
    if init_rows < n_valid:
        # contiguous-prefix subsample: callers hand rows in randomized
        # (permuted-subset or dataset) order, so a prefix is an unbiased
        # draw; a pow2 bucket keeps the compile count bounded
        m = min(_pad_pow2(init_rows), data.shape[0])
        centroids = _kmeanspp_init(
            jax.lax.slice_in_dim(data, 0, m, axis=0), key, k, min(init_rows, m)
        )
    else:
        centroids = _kmeanspp_init(data, key, k, n_valid)
    if timings is not None:
        centroids.block_until_ready()
        timings["init_s"] = round(_time.perf_counter() - t0, 2)
        t0 = _time.perf_counter()
    iters = 0
    prev_obj = None
    pending = None  # (centroids, objective) one step ahead of the check
    for i in range(niter):
        centroids, obj = _lloyd_step(
            data, centroids, k, block, n_valid, spherical, assign_dtype
        )
        iters = i + 1
        if timings is not None and i == 0:
            # split the first dispatch out of lloyd_s: it carries the
            # program compile when the persistent cache misses (a cold
            # tunnel compile is minutes — without this split it reads as
            # a slow algorithm in the bench build_breakdown)
            centroids.block_until_ready()
            timings["lloyd_first_s"] = round(_time.perf_counter() - t0, 2)
        if tol <= 0.0:
            continue
        if pending is not None:
            o = float(pending)  # sync: the PREVIOUS step's objective
            if prev_obj is not None and (prev_obj - o) <= tol * max(
                abs(prev_obj), 1e-30
            ):
                break
            prev_obj = o
        pending = obj
    if timings is not None:
        centroids.block_until_ready()
        timings["lloyd_s"] = round(_time.perf_counter() - t0, 2)
    return centroids, iters


def run_kmeans(
    data: np.ndarray,
    k: int,
    niter: int = 25,
    seed: int = 42,
    nredo: int = 1,
    spherical: bool = False,
    max_points_per_centroid: int = DEFAULT_MAX_POINTS_PER_CENTROID,
    data_dev: jax.Array | None = None,
    n_valid: int | None = None,
    assign_dtype: str = "f32",
    tol: float = 0.0,
    with_report: bool = False,
) -> KMeansResult:
    """Run k-means. ``data`` [N, D] float32 (host).

    Pass ``data_dev`` (the same rows already on device) to avoid
    re-uploading the dataset — transfers dominate build time behind a slow
    device tunnel. Rows >= ``n_valid`` of ``data_dev`` are padding: they
    are never sampled for training and are dropped from the returned
    assignments (callers pad to pow2 buckets so repeated variable-size
    k-means runs reuse compiled programs). Deterministic for a given seed
    (matches the property asserted by ``kmeans.rs:757-780``).

    ``assign_dtype="bf16"`` runs the assignment dots (the FLOPs) with
    bf16 MXU operands; ``tol`` enables the objective early stop (see
    ``_kmeans_device``); ``with_report`` adds phase timings to the
    result's ``report`` (syncs between phases — measurement only).
    Under bf16 the reported ``objective`` carries ~|x||c|*2^-9 absolute
    dot-rounding noise per row — fine for the early-stop delta and for
    nredo comparison (both compare like against like), but score the
    final partition with an f32 ``assign_dataset`` when the absolute
    value matters.
    """
    if data_dev is None:
        data = np.ascontiguousarray(data, dtype=np.float32)
        data_dev = jnp.asarray(data)
    n_rows, dim = data_dev.shape
    n = n_rows if n_valid is None else n_valid
    assert 0 < k <= n, "k must be in (0, len(data)]"
    assert niter > 0

    rng = np.random.default_rng(seed)
    # --- training subset (kmeans.rs:210-226) ---
    target = max(min(n, k * max_points_per_centroid), k)
    # don't pad tiny inputs up to the full tile budget (hierarchical MSTG
    # splits run many small k-means); pow2 buckets bound compile count
    block = min(_block_size(k), _pad_pow2(target))
    if target < n:
        idx = rng.permutation(n)[:target]
        idx.sort()
        nt = target
        nt_pad = ((nt + block - 1) // block) * block
        idx_pad = np.zeros(nt_pad, np.int64)
        idx_pad[:nt] = idx
        train_dev = jnp.take(data_dev, jnp.asarray(idx_pad), axis=0)
    else:
        nt = n
        nt_pad = ((nt + block - 1) // block) * block
        if nt_pad == n_rows:
            train_dev = data_dev
        elif nt_pad < n_rows:
            train_dev = jax.lax.slice_in_dim(data_dev, 0, nt_pad, axis=0)
        else:
            train_dev = jnp.concatenate(
                [data_dev, jnp.zeros((nt_pad - n_rows, dim), jnp.float32)]
            )

    best: KMeansResult | None = None
    for redo in range(nredo):
        import time as _time

        timings: dict | None = {} if with_report else None
        key = jax.random.PRNGKey(seed * 1_000_003 + redo)
        cent_dev, iters = _kmeans_device(
            train_dev, key, k, niter, block, nt, spherical,
            assign_dtype=assign_dtype, tol=tol, timings=timings,
        )
        centroids = np.asarray(cent_dev)
        # the final full-dataset assignment picks its own tile size: the
        # training block may be capped by a small sampled subset
        t0 = _time.perf_counter()
        assignments, objective = assign_dataset(
            data_dev, centroids, block=None, n_valid=n,
            assign_dtype=assign_dtype,
        )
        if timings is not None:
            timings["assign_s"] = round(_time.perf_counter() - t0, 2)
            timings["assign_dtype"] = assign_dtype
        result = KMeansResult(
            centroids=centroids, assignments=assignments,
            objective=objective, iters=iters, report=timings,
        )
        if best is None or result.objective < best.objective:
            best = result
    assert best is not None
    return best


def assign_dataset(
    data,
    centroids: np.ndarray,
    block: int | None = None,
    n_valid: int | None = None,
    assign_dtype: str = "f32",
) -> tuple[np.ndarray, float]:
    """Assign every row of ``data`` (host or device array) to its nearest
    centroid (``kmeans.rs:604-642``).

    Returns (assignments [N] int32, objective = sum of min squared dists).
    """
    n, dim = data.shape
    if n_valid is None:
        n_valid = n
    k = centroids.shape[0]
    if block is None:
        block = min(_block_size(k), _pad_pow2(n))
    # pow2 row bucket: variable-size callers (hierarchical splits) hit a
    # bounded set of compiled programs instead of one per distinct size
    n_pad = max(_pad_pow2(n), block)
    if isinstance(data, jax.Array):
        data_dev = (
            data
            if n_pad == n
            else jnp.concatenate([data, jnp.zeros((n_pad - n, dim), jnp.float32)])
        )
    else:
        data_pad = np.zeros((n_pad, dim), np.float32)
        data_pad[:n] = np.ascontiguousarray(data, np.float32)
        data_dev = jnp.asarray(data_pad)
    assign, dists = _assign_blocks(
        data_dev, jnp.asarray(centroids), block, assign_dtype
    )
    assign = np.asarray(assign)[:n_valid]
    objective = float(np.sum(np.asarray(dists)[:n_valid], dtype=np.float64))
    return assign, objective
