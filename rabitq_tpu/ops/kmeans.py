"""K-means clustering on device.

Faiss-style sampled Lloyd iterations, following the reference pipeline
(lqhl/rabitq-rs ``src/kmeans.rs``): training-set subsampling capped at
``max_points_per_centroid`` (``kmeans.rs:210-226``), random Forgy init
(``kmeans.rs:229-245``), GEMM-based assignment in row blocks
(``kmeans.rs:439-547``), empty-cluster reseeding from far-point candidates
(``kmeans.rs:564-602``), multi-restart by objective (``kmeans.rs:104-183``)
and optional spherical normalization (``kmeans.rs:352-367``).

The reference's sgemm-per-chunk + rayon fold/reduce becomes: one jitted
device step per Lloyd iteration — blockwise ``x @ C^T`` on the MXU, argmin,
``segment_sum`` centroid accumulation — with only the (tiny) empty-cluster
reseed decision on the host between iterations.
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


def _block_size(k: int) -> int:
    # Keep the [block, k] distance tile around <=64 MB.
    return int(max(256, min(32768, (1 << 24) // max(k, 1))))


@functools.partial(jax.jit, static_argnames=("block",))
def _assign_blocks(data: jax.Array, centroids: jax.Array, block: int):
    """Blockwise nearest-centroid assignment.

    data [N, D] (N padded to a multiple of ``block``), centroids [k, D].
    Returns (assignments [N] int32, min_dists [N] f32). Distance is the
    clamped expansion ||x||^2 + ||c||^2 - 2 x.c (``kmeans.rs:496-507``).
    """
    n, d = data.shape
    c_norm = jnp.sum(centroids * centroids, axis=-1)  # [k]
    ct = centroids.T  # [D, k]

    def one_block(xb):
        dot = jnp.dot(xb, ct, preferred_element_type=jnp.float32)  # [block, k]
        x_norm = jnp.sum(xb * xb, axis=-1, keepdims=True)
        dist = jnp.maximum(x_norm + c_norm[None, :] - 2.0 * dot, 0.0)
        best = jnp.argmin(dist, axis=-1)
        return best.astype(jnp.int32), jnp.min(dist, axis=-1)

    blocks = data.reshape(n // block, block, d)
    assign, dists = jax.lax.map(one_block, blocks)
    return assign.reshape(n), dists.reshape(n)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def _lloyd_step(data: jax.Array, centroids: jax.Array, k: int, block: int):
    """One Lloyd iteration on device.

    Returns (sums [k, D], counts [k], far_dists [8], far_idx [8]) — the
    far-point candidates feed the host-side empty-cluster reseed
    (``kmeans.rs:549-601``).
    """
    assign, dists = _assign_blocks(data, centroids, block)
    sums = jax.ops.segment_sum(data, assign, num_segments=k)
    counts = jax.ops.segment_sum(
        jnp.ones((data.shape[0],), jnp.float32), assign, num_segments=k
    )
    far_dists, far_idx = jax.lax.top_k(dists, RESEED_CANDIDATES)
    return sums, counts, far_dists, far_idx


@functools.partial(jax.jit, static_argnames=("k", "n_valid"))
def _kmeanspp_init(data: jax.Array, key: jax.Array, k: int, n_valid: int) -> jax.Array:
    """k-means++ (D^2-weighted) seeding, entirely on device.

    ``data`` [N, D] (rows >= n_valid are padding and excluded). One jitted
    fori_loop: each step scores distances to the last chosen centroid
    (a [N, D] x [D] matvec), folds them into the running min-distance, and
    samples the next centroid by inverse-CDF over that distribution.

    This deliberately upgrades the reference's random Forgy init
    (``kmeans.rs:229-245``): D^2 seeding avoids the
    two-centroids-in-one-natural-cluster local optima that plain Lloyd
    cannot escape (empty-cluster reseeding never fires on them).
    """
    n, d = data.shape
    valid = (jnp.arange(n) < n_valid)
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
        idx = jnp.searchsorted(cum, u)
        idx = jnp.clip(idx, 0, n_valid - 1)
        # degenerate case: all remaining distances zero -> any valid row
        idx = jnp.where(total > 0, idx, first)
        return centroids.at[i].set(data[idx]), min_d2

    centroids, _ = jax.lax.fori_loop(1, k, body, (centroids0, min_d2_0))
    return centroids


def run_kmeans(
    data: np.ndarray,
    k: int,
    niter: int = 25,
    seed: int = 42,
    nredo: int = 1,
    spherical: bool = False,
    max_points_per_centroid: int = DEFAULT_MAX_POINTS_PER_CENTROID,
) -> KMeansResult:
    """Run k-means. ``data`` [N, D] float32 (host).

    Deterministic for a given seed (matches the property asserted by
    ``kmeans.rs:757-780``).
    """
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, dim = data.shape
    assert 0 < k <= n, "k must be in (0, len(data)]"
    assert niter > 0

    rng = np.random.default_rng(seed)
    # --- training subset (kmeans.rs:210-226) ---
    target = max(min(n, k * max_points_per_centroid), k)
    if target < n:
        idx = rng.permutation(n)[:target]
        idx.sort()
        train = data[idx]
    else:
        train = data
    nt = train.shape[0]

    block = _block_size(k)
    # pad training rows to a block multiple; padded rows get weight 0 by
    # assigning them to a scratch copy of row 0 and subtracting.
    nt_pad = ((nt + block - 1) // block) * block
    train_pad = np.zeros((nt_pad, dim), np.float32)
    train_pad[:nt] = train
    train_dev = jnp.asarray(train_pad)

    best: KMeansResult | None = None
    for redo in range(nredo):
        redo_rng = np.random.default_rng((seed, redo))
        key = jax.random.PRNGKey(seed * 1_000_003 + redo)
        centroids = _kmeanspp_init(train_dev, key, k, nt)

        for _ in range(niter):
            sums, counts, far_d, far_i = _lloyd_step(train_dev, centroids, k, block)
            sums = np.array(sums)  # writable host copies
            counts = np.array(counts)
            if nt_pad != nt:
                # remove padded-row contributions (they are all-zero rows that
                # land in whichever cluster is nearest to the origin)
                pad_assign, _ = _assign_blocks(
                    jnp.zeros((block, dim), jnp.float32), centroids, block
                )
                c0 = int(np.asarray(pad_assign)[0])
                counts[c0] -= nt_pad - nt
            new_centroids = np.zeros((k, dim), np.float32)
            nonempty = counts > 0
            new_centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
            empty = np.flatnonzero(~nonempty)
            if empty.size:
                far_i = np.asarray(far_i)
                cand = [i for i in dict.fromkeys(far_i.tolist()) if i < nt]
                for j, cluster in enumerate(empty):
                    if j < len(cand):
                        new_centroids[cluster] = train[cand[j]]
                    else:
                        new_centroids[cluster] = train[redo_rng.integers(0, nt)]
            if spherical:
                norms = np.linalg.norm(new_centroids, axis=-1, keepdims=True)
                np.divide(new_centroids, norms, out=new_centroids, where=norms > 0)
            centroids = jnp.asarray(new_centroids)

        # --- full-dataset assignment + objective (kmeans.rs:604-642) ---
        assignments, objective = assign_dataset(data, np.asarray(centroids), block=block)
        result = KMeansResult(
            centroids=np.asarray(centroids), assignments=assignments, objective=objective
        )
        if best is None or result.objective < best.objective:
            best = result
    assert best is not None
    return best


def assign_dataset(
    data: np.ndarray, centroids: np.ndarray, block: int | None = None
) -> tuple[np.ndarray, float]:
    """Assign every row of ``data`` to its nearest centroid.

    Returns (assignments [N] int32, objective = sum of min squared dists).
    """
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, dim = data.shape
    k = centroids.shape[0]
    if block is None:
        block = _block_size(k)
    n_pad = ((n + block - 1) // block) * block
    data_pad = np.zeros((n_pad, dim), np.float32)
    data_pad[:n] = data
    assign, dists = _assign_blocks(jnp.asarray(data_pad), jnp.asarray(centroids), block)
    assign = np.asarray(assign)[:n]
    objective = float(np.sum(np.asarray(dists)[:n], dtype=np.float64))
    return assign, objective
