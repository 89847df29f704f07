"""Multi-chip sharding for the RaBitQ engine.

The reference is strictly single-node (rayon threads + SIMD; SURVEY.md
section 2.3). The TPU-native scale story shards the *row axis* of the code
planes across a device mesh over ICI:

* every device holds an equal slice of ``binary``/``ex`` codes and per-row
  factors (rows stay grouped by cluster; a cluster's rows may span shards —
  correctness only needs the row -> cluster id map, which is sharded along
  with the rows);
* centroids and queries are replicated (tiny);
* each device runs the same fused scan on its slice and keeps its local
  top-``rerank`` candidates, then one ``all_gather`` of the (ids, dists)
  candidate tuples — O(B * rerank) bytes, not O(N) — rides ICI before a
  replicated final top-k.

This is expressed with ``shard_map`` so the per-device program is exactly
the single-chip kernel (``index/scan.py``) and the only collective is the
explicit candidate gather.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import Metric
from ..index.scan import probe_k_bucket, scan_kernel

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (SHARD_AXIS,))


def shard_rows(mesh: Mesh, *arrays):
    """Place arrays with their leading (row) axis sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(SHARD_AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def replicate(mesh: Mesh, *arrays):
    out = [jax.device_put(a, NamedSharding(mesh, P())) for a in arrays]
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "top_k",
        "nprobe",
        "rerank",
        "metric",
        "ex_bits",
        "scan_dtype",
        "use_prune_epsilon",
        "refine_ex",
        "clamp_l2",
        "centroid_select_l2",
        "approx_topk",
        "max_tiles",
        "probe_k",
        "fused_exact",
    ),
)
def sharded_scan(
    q_rot: jax.Array,
    centroids: jax.Array,
    binary: jax.Array,
    ex: jax.Array,
    f_add: jax.Array,
    f_rescale: jax.Array,
    f_error: jax.Array,
    f_add_ex: jax.Array,
    f_rescale_ex: jax.Array,
    cluster_of: jax.Array,
    row_allowed: jax.Array,
    ids: jax.Array,
    prune_epsilon: jax.Array | float = 0.0,
    packed: jax.Array | None = None,  # [Np, Db] row-sharded (fused path)
    fused_cblk: jax.Array | None = None,  # [N_tiles] tile-sharded (fused path)
    *,
    mesh: Mesh,
    top_k: int,
    nprobe: int,
    rerank: int,
    metric: Metric,
    ex_bits: int,
    scan_dtype: str,
    use_prune_epsilon: bool = False,
    refine_ex: bool = True,
    clamp_l2: bool = False,
    centroid_select_l2: bool = False,
    approx_topk: bool = True,
    max_tiles: int | None = None,
    probe_k: int | None = None,
    fused_exact: bool = False,
):
    """Row-sharded batched search over a device mesh.

    Same contract as ``scan_kernel`` (incl. the MSTG pruning/refinement
    flags) but with the row-axis arrays sharded over ``mesh``. Per-device
    local top-k candidates are merged with one all_gather.
    """
    # Each device contributes its local top_k; the union of per-shard
    # top_k sets always contains the global top_k.
    local_k = top_k
    row_spec = P(SHARD_AXIS)
    row_spec2 = P(SHARD_AXIS, None)
    fused = scan_dtype in ("fused", "fused8")
    needs_packed = fused or scan_dtype == "packed"

    def per_device(q, cents, b, e, fa, fr, fe, fae, fre, cof, allow, idv, peps,
                   *fused_args):
        loc_ids, loc_dist = scan_kernel(
            q,
            cents,
            b,
            e,
            fa,
            fr,
            fe,
            fae,
            fre,
            cof,
            allow,
            idv,
            prune_epsilon=peps,
            packed=fused_args[0] if needs_packed else None,
            fused_cblk=fused_args[1] if fused else None,
            top_k=local_k,
            nprobe=nprobe,
            rerank=rerank,
            metric=metric,
            ex_bits=ex_bits,
            scan_dtype=scan_dtype,
            use_prune_epsilon=use_prune_epsilon,
            refine_ex=refine_ex,
            clamp_l2=clamp_l2,
            centroid_select_l2=centroid_select_l2,
            approx_topk=approx_topk,
            # per-shard tile budget: the wrappers compute it from the
            # per-slice bounds (sliced_max_tiles), so it fits each shard's
            # local tile count; fused_select clamps as a backstop
            max_tiles=max_tiles,
            probe_k=probe_k,
            # exact in-kernel scoring (no stage-2 survivor gather) shards
            # cleanly: every shard's refine-plane slab keeps the width-
            # padded 128-lane alignment the layout provides
            fused_exact=fused_exact,
        )
        # candidate merge over ICI: [B, local_k] -> [B, n_dev * local_k]
        all_ids = jax.lax.all_gather(loc_ids, SHARD_AXIS, axis=1, tiled=True)
        all_dist = jax.lax.all_gather(loc_dist, SHARD_AXIS, axis=1, tiled=True)
        neg, pos = jax.lax.top_k(-all_dist, top_k)
        return jnp.take_along_axis(all_ids, pos, axis=1), -neg

    in_specs = [
        P(),  # queries replicated
        P(),  # centroids replicated
        row_spec2,  # binary
        row_spec2,  # ex
        row_spec,
        row_spec,
        row_spec,
        row_spec,
        row_spec,
        row_spec,  # cluster_of
        row_spec,  # row_allowed
        row_spec,  # ids
        P(),  # prune_epsilon (replicated traced scalar)
    ]
    args = [
        q_rot,
        centroids,
        binary,
        ex,
        f_add,
        f_rescale,
        f_error,
        f_add_ex,
        f_rescale_ex,
        cluster_of,
        row_allowed,
        ids,
        jnp.float32(prune_epsilon),
    ]
    if needs_packed:
        # packed bitplanes shard with the rows ("packed" and fused paths);
        # c_blk shards with the row tiles (both leading axes are
        # row-aligned: rows per shard is a multiple of the kernel's TN)
        in_specs += [row_spec2]
        args += [packed]
    if fused:
        in_specs += [row_spec]
        args += [fused_cblk]
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )(*args)


def _sliced_fused_max_tiles(wrapper, cluster_sizes, nprobe, batch, *, fused):
    """Shared per-shard compaction budget for the sharded wrappers: the
    slice list is ``n_dev`` equal ``_slab_rows`` windows of the
    cluster-sorted row space; results are cached per (nprobe, batch-tile)
    like the single-chip ``_fused_max_tiles``."""
    import os

    if not fused or not isinstance(nprobe, (int, np.integer)):
        return None
    if os.environ.get("RABITQ_FUSED_COMPACT", "1") == "0":
        return None
    from ..ops.pallas_fused_scan import TB, sliced_max_tiles

    bt = min(TB, ((int(batch) + 31) // 32) * 32)
    key = (int(nprobe), bt)
    cache = getattr(wrapper, "_max_tiles_cache", None)
    if cache is None:
        cache = wrapper._max_tiles_cache = {}
    if key not in cache:
        L = wrapper._slab_rows
        n_dev = wrapper.mesh.shape[SHARD_AXIS]
        slices = [(i * L, (i + 1) * L) for i in range(n_dev)]
        cache[key] = sliced_max_tiles(cluster_sizes, int(nprobe), slices, bt)
    return cache[key]


class ShardedIvfIndex:
    """Row-sharded serving wrapper around a trained ``IvfRabitqIndex``.

    Shards the code planes and per-row factors across a device mesh and
    serves batched queries with one all-gather candidate merge. Build the
    index once (single chip or host), then wrap:

        mesh = sharding.make_mesh()
        sharded = sharding.ShardedIvfIndex(index, mesh)
        ids, dists = sharded.batch_search_arrays(queries, params)
    """

    @classmethod
    def train(
        cls,
        data: np.ndarray,
        nlist: int,
        total_bits: int,
        metric: Metric = Metric.L2,
        mesh: Mesh | None = None,
        seed: int = 42,
        use_faster_config: bool = False,
        kmeans_iters: int = 25,
        scan_dtype: str = "bf16",
    ) -> "ShardedIvfIndex":
        """End-to-end sharded build: data-parallel k-means (psum over ICI),
        row-sharded rotate+quantize, then row-sharded serving — the public
        multi-chip pipeline (SURVEY §2.3 row 5)."""
        from ..index.ivf import HostCodes, IvfRabitqIndex
        from ..ops.quantize import compute_const_scaling_factor
        from ..ops.rotation import make_rotator
        from ..types import RotatorType

        mesh = mesh or make_mesh()
        data = np.ascontiguousarray(data, np.float32)
        IvfRabitqIndex._validate_train_args(data, nlist, total_bits)
        km = sharded_kmeans(data, nlist, mesh=mesh, niter=kmeans_iters, seed=seed)

        n, dim = data.shape
        ex_bits = total_bits - 1
        rotator = make_rotator(dim, RotatorType.FhtKacRotator, seed)
        rotated_cents = rotator.rotate_np(km.centroids)

        order = np.argsort(km.assignments, kind="stable")
        sizes = np.bincount(km.assignments, minlength=nlist)
        offsets = np.zeros(nlist + 1, np.int64)
        np.cumsum(sizes, out=offsets[1:])
        assign_sorted = km.assignments[order]

        t_const, t_rows = 0.0, None
        if ex_bits > 0:
            if use_faster_config:
                t_const = compute_const_scaling_factor(
                    rotator.padded_dim, ex_bits, seed
                )
            else:
                from ..index.build import exact_t_rows

                t_rows = exact_t_rows(
                    data, km.centroids, assign_sorted, order, rotator, ex_bits
                )
        codes = sharded_build_codes(
            data[order],
            rotated_cents,
            assign_sorted,
            mesh=mesh,
            rotator=rotator,
            ex_bits=ex_bits,
            metric=metric,
            use_t_const=use_faster_config,
            t_const=t_const,
            t_rows=t_rows,
        )
        host = HostCodes(
            binary_bits=codes["binary"],
            ex_codes=codes["ex"],
            f_add=codes["f_add"],
            f_rescale=codes["f_rescale"],
            f_error=codes["f_error"],
            f_add_ex=codes["f_add_ex"],
            f_rescale_ex=codes["f_rescale_ex"],
            delta=codes["delta"],
            vl=codes["vl"],
            ids=order.astype(np.int64),
            cluster_offsets=offsets,
            centroids=rotated_cents,
        )
        index = IvfRabitqIndex(
            dim, rotator.padded_dim, metric, rotator, ex_bits, host,
            scan_dtype=scan_dtype,
        )
        return cls(index, mesh)

    def __init__(self, index, mesh: Mesh | None = None):
        import numpy as np

        self.index = index
        self.mesh = mesh or make_mesh()
        index._maybe_downgrade_fused()  # degenerate geometry -> dense path
        dev = index.device
        n_dev = self.mesh.shape[SHARD_AXIS]
        rows = int(dev.ids.shape[0])
        self._fused = index.scan_dtype in ("fused", "fused8")
        self._packed_mode = index.scan_dtype == "packed"
        # pad rows to a multiple of the mesh size (fused/packed: each
        # shard must also be a whole number of TN-row kernel tiles)
        unit = n_dev
        if self._fused:
            from ..ops.pallas_fused_scan import TN

            unit = n_dev * TN
        elif self._packed_mode:
            from ..ops.pallas_scan import TN as PACKED_TN

            unit = n_dev * PACKED_TN
        pad_to = ((rows + unit - 1) // unit) * unit

        def padded(x):
            x = np.asarray(x)
            if x.shape[0] == pad_to:
                return x
            out = np.zeros((pad_to, *x.shape[1:]), x.dtype)
            out[:rows] = x
            return out

        self._slab_rows = pad_to // n_dev  # rows per device (TN-aligned)
        ids_np = np.asarray(dev.ids)
        ids_pad = np.full(pad_to, -1, np.int32)
        ids_pad[:rows] = ids_np
        # fused layouts with a TOTAL refine plane drop the dense binary
        # plane; the per-shard scan never reads it, so shard a 1-wide
        # placeholder instead of resurrecting ~1 GB of dead weight
        binary_pad = (
            padded(dev.binary)
            if dev.binary is not None
            else np.zeros((pad_to, 1), np.int8)
        )
        valid_pad = padded(dev.valid)
        cluster_pad = padded(dev.cluster_of)
        self._rows = shard_rows(
            self.mesh,
            binary_pad,
            padded(dev.ex),
            padded(dev.f_add),
            padded(dev.f_rescale),
            padded(dev.f_error),
            padded(dev.f_add_ex),
            padded(dev.f_rescale_ex),
            cluster_pad,
            valid_pad,
            ids_pad,
        )
        self._packed = self._cblk = None
        if self._fused:
            from ..ops.pallas_fused_scan import tile_cluster_blocks

            if dev.packed is not None:
                packed = padded(dev.packed)
            else:
                from ..ops.pallas_scan import pack_bitplanes

                packed = np.asarray(
                    pack_bitplanes(jnp.asarray(binary_pad), index.padded_dim)
                )
            cblk = tile_cluster_blocks(cluster_pad, valid_pad)
            (self._packed, self._cblk) = shard_rows(self.mesh, packed, cblk)
        elif self._packed_mode:
            from ..ops.pallas_scan import pack_bitplanes

            packed = np.asarray(
                pack_bitplanes(jnp.asarray(binary_pad), index.padded_dim)
            )
            (self._packed,) = shard_rows(self.mesh, packed)
        (self._centroids,) = replicate(self.mesh, np.asarray(dev.centroids))
        self._valid_pad = valid_pad  # host copy: filtered search re-shards

    def _fused_max_tiles(self, nprobe, batch):
        """Per-SHARD probed-tile budget: each device's kernel sees only its
        own ``_slab_rows``-row slice, so the budget comes from the max of
        the per-slice bounds (``sliced_max_tiles``), not the whole-index
        bound (which routinely exceeds a slice's tile count and would
        leave compaction off on every shard)."""
        return _sliced_fused_max_tiles(
            self,
            np.diff(self.index._offsets),
            nprobe,
            batch,
            fused=self._fused,
        )

    def batch_search_arrays(self, queries, params, filter_ids=None):
        """Row-sharded batched search; ``filter_ids`` restricts results to
        the given vector ids (``ivf.rs:1723-1730`` semantics) — the row
        mask shards with the rows."""
        import numpy as np
        import jax.numpy as jnp

        queries = np.atleast_2d(np.asarray(queries, np.float32))
        rows = self._rows
        if filter_ids is not None:
            mask = self.index._row_filter(filter_ids)  # device-layout order
            mask_pad = np.zeros(self._valid_pad.shape[0], bool)
            mask_pad[: mask.shape[0]] = mask
            (allowed_sh,) = shard_rows(self.mesh, self._valid_pad & mask_pad)
            rows = (*rows[:8], allowed_sh, rows[9])
        q_rot = self.index._rotate_jit(jnp.asarray(queries))
        (q_rep,) = replicate(self.mesh, np.asarray(q_rot))
        ids, dists = sharded_scan(
            q_rep,
            self._centroids,
            *rows,
            packed=self._packed,
            fused_cblk=self._cblk,
            mesh=self.mesh,
            top_k=params.top_k,
            nprobe=params.nprobe,
            rerank=params.resolved_rerank(),
            metric=self.index.metric,
            ex_bits=self.index.ex_bits,
            # every scan mode is sharded: each shard runs the single-chip
            # kernel ("packed"/fused incl. their Pallas stages) on its own
            # tile-aligned row slice
            scan_dtype=self.index.scan_dtype,
            max_tiles=self._fused_max_tiles(params.nprobe, queries.shape[0]),
            probe_k=probe_k_bucket(
                params.nprobe, self.index.cluster_count(), self.index.scan_dtype
            ),
            fused_exact=self.index._fused_exact_ok(),
        )
        return jax.device_get((ids, dists))


class ShardedMstgIndex:
    """Row-sharded serving wrapper around a built ``MstgIndex``.

    Same structure as :class:`ShardedIvfIndex` — posting-list rows shard
    across the mesh, centroids/queries replicate, and the per-device scan
    keeps the MSTG semantics (ef_search probe count, dynamic ε-pruning,
    f_error = 0, L2 clamp, optional ex refinement) before the all-gather
    candidate merge.
    """

    def __init__(self, index, mesh: Mesh | None = None):
        self.index = index
        self.mesh = mesh or make_mesh()
        index._maybe_downgrade_fused()  # degenerate geometry -> dense path
        dev = index.device  # DeviceLayout
        n_dev = self.mesh.shape[SHARD_AXIS]
        rows = int(dev.ids.shape[0])
        self._fused = index.scan_dtype in ("fused", "fused8")
        self._packed_mode = index.scan_dtype == "packed"
        unit = n_dev
        if self._fused:
            from ..ops.pallas_fused_scan import TN

            unit = n_dev * TN
        elif self._packed_mode:
            from ..ops.pallas_scan import TN as PACKED_TN

            unit = n_dev * PACKED_TN
        pad_to = ((rows + unit - 1) // unit) * unit
        self._slab_rows = pad_to // n_dev  # rows per device (TN-aligned)

        def padded(x, fill=0):
            x = np.asarray(x)
            if x.shape[0] == pad_to:
                return x
            out = np.full((pad_to, *x.shape[1:]), fill, x.dtype)
            out[:rows] = x
            return out

        binary_pad = (
            padded(dev.binary)
            if dev.binary is not None
            else np.zeros((pad_to, 1), np.int8)
        )
        valid_pad = padded(dev.valid)
        cluster_pad = padded(dev.cluster_of)
        self._rows = shard_rows(
            self.mesh,
            binary_pad,
            padded(dev.ex),
            padded(dev.f_add),
            padded(dev.f_rescale),
            padded(dev.f_error),
            padded(dev.f_add_ex),
            padded(dev.f_rescale_ex),
            cluster_pad,
            valid_pad,
            padded(dev.ids, fill=-1),
        )
        self._packed = self._cblk = None
        if self._fused:
            from ..ops.pallas_fused_scan import tile_cluster_blocks

            if dev.packed is not None:
                packed = padded(dev.packed)
            else:
                from ..ops.pallas_scan import pack_bitplanes

                packed = np.asarray(
                    pack_bitplanes(jnp.asarray(binary_pad), index.quant_dim)
                )
            cblk = tile_cluster_blocks(cluster_pad, valid_pad)
            (self._packed, self._cblk) = shard_rows(self.mesh, packed, cblk)
        elif self._packed_mode:
            from ..ops.pallas_scan import pack_bitplanes

            packed = np.asarray(
                pack_bitplanes(jnp.asarray(binary_pad), index.quant_dim)
            )
            (self._packed,) = shard_rows(self.mesh, packed)
        (self._centroids,) = replicate(self.mesh, np.asarray(dev.centroids))

    def _fused_max_tiles(self, ef_search, batch):
        """Per-SHARD probed-tile budget (see ShardedIvfIndex's twin)."""
        return _sliced_fused_max_tiles(
            self,
            np.diff(self.index._offsets),  # metadata: no lazy host download
            ef_search,
            batch,
            fused=self._fused,
        )

    def batch_search(self, queries: np.ndarray, params) -> list:
        index = self.index
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = queries.shape[0]
        q = queries
        if index.rotator is not None:
            q = index.rotator.rotate_np(queries)
        (q_rep,) = replicate(self.mesh, q)

        rerank = max(
            params.resolved_rerank(),
            int(np.ceil(params.top_k * index.replication_factor())) + 16,
        )
        ids, dists = sharded_scan(
            q_rep,
            self._centroids,
            *self._rows,
            prune_epsilon=params.pruning_epsilon,
            packed=self._packed,
            fused_cblk=self._cblk,
            mesh=self.mesh,
            top_k=rerank,  # fetch the dedup budget, like MstgIndex does
            nprobe=params.ef_search,
            rerank=rerank,
            metric=index.config.metric,
            ex_bits=index.config.rabitq_bits - 1,
            scan_dtype=index.scan_dtype,
            use_prune_epsilon=True,
            refine_ex=index.config.refine_ex,
            clamp_l2=True,
            centroid_select_l2=True,
            approx_topk=index.approx_topk,
            max_tiles=self._fused_max_tiles(params.ef_search, b),
            fused_exact=index._fused_exact_ok(),
            probe_k=probe_k_bucket(
                params.ef_search, index.posting_list_count(), index.scan_dtype
            ),
        )
        # closure dedup ON DEVICE before the fetch (same helper as the
        # single-chip path): shrinks the result fetch from [B, rerank] to
        # [B, top_k] and leaves only the SearchResult conversion on host
        ids, dists = type(index)._dedup_topk_device(
            ids, dists, top_k=params.top_k
        )
        ids, dists = jax.device_get((ids, dists))
        return index._dedup_results(ids[:b], dists[:b], params.top_k)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "block"))
def sharded_kmeans_step(
    data: jax.Array,
    centroids: jax.Array,
    valid: jax.Array | None = None,
    *,
    mesh: Mesh,
    k: int,
    block: int,
):
    """One data-parallel Lloyd iteration over the mesh: local GEMM
    assignment + segment sums, then psum of (sums, counts) over ICI — the
    multi-chip analogue of ``ops/kmeans._lloyd_step``.

    ``valid`` (row-sharded bool, optional) routes padding rows to a
    scratch segment so they contribute nothing."""
    from ..ops.kmeans import _assign_blocks

    if valid is None:
        valid = jnp.ones((data.shape[0],), bool)

    def per_device(x, c, v):
        assign, dists = _assign_blocks(x, c, block)
        seg = jnp.where(v, assign, k)  # padding -> scratch segment
        sums = jax.ops.segment_sum(x, seg, num_segments=k + 1)[:k]
        counts = jax.ops.segment_sum(
            jnp.ones((x.shape[0],), jnp.float32), seg, num_segments=k + 1
        )[:k]
        sums = jax.lax.psum(sums, SHARD_AXIS)
        counts = jax.lax.psum(counts, SHARD_AXIS)
        return sums, counts, assign

    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(), P(SHARD_AXIS)),
        out_specs=(P(), P(), P(SHARD_AXIS)),
        check_vma=False,
    )(data, centroids, valid)


def sharded_kmeans(
    data: np.ndarray,
    k: int,
    *,
    mesh: Mesh,
    niter: int = 25,
    seed: int = 42,
    max_points_per_centroid: int = 256,
):
    """Full data-parallel k-means over the mesh.

    Rows are sharded; each Lloyd iteration is one ``sharded_kmeans_step``
    (local GEMM assignment + segment sums, psum over ICI). Init is
    k-means++ on a replicated subsample (tiny); empty clusters reseed
    from random rows. Returns ``ops.kmeans.KMeansResult``.
    """
    from ..ops.kmeans import KMeansResult, _kmeanspp_init

    data = np.ascontiguousarray(data, np.float32)
    n, dim = data.shape
    n_dev = mesh.shape[SHARD_AXIS]
    rng = np.random.default_rng(seed)

    # rows per device padded to a block multiple
    block = int(max(256, min(8192, (1 << 22) // max(k, 1))))
    per_dev = ((n + n_dev - 1) // n_dev + block - 1) // block * block
    n_pad = per_dev * n_dev
    data_pad = np.zeros((n_pad, dim), np.float32)
    data_pad[:n] = data
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    (data_sh, valid_sh) = shard_rows(mesh, data_pad, valid)

    # k-means++ init on a replicated subsample (one small single-shard op)
    target = int(min(n, max(k * max_points_per_centroid // 8, k)))
    sub = data[rng.permutation(n)[:target]]
    sub_pad = np.zeros((((target + 255) // 256) * 256, dim), np.float32)
    sub_pad[:target] = sub
    key = jax.random.PRNGKey(seed * 1_000_003)
    centroids = np.asarray(_kmeanspp_init(jnp.asarray(sub_pad), key, k, target))

    assign_sh = None
    for _ in range(niter):
        (cents_rep,) = replicate(mesh, centroids)
        sums, counts, assign_sh = sharded_kmeans_step(
            data_sh, cents_rep, valid_sh, mesh=mesh, k=k, block=block
        )
        counts_np = np.asarray(counts)
        centroids = np.asarray(sums) / np.maximum(counts_np, 1.0)[:, None]
        empty = counts_np == 0
        if empty.any():  # reseed empties from random valid rows
            centroids[empty] = data[rng.integers(0, n, int(empty.sum()))]

    assignments = np.asarray(assign_sh)[:n].astype(np.int32)
    # objective: recompute from final assignment (cheap, host)
    diffs = data - centroids[assignments]
    objective = float(np.sum(diffs * diffs, dtype=np.float64))
    return KMeansResult(
        centroids=centroids.astype(np.float32),
        assignments=assignments,
        objective=objective,
    )


def sharded_build_codes(
    data_sorted: np.ndarray,  # [M, dim] rows in storage order (host)
    rotated_centroids: np.ndarray,  # [C, Dpad]
    assign_sorted: np.ndarray,  # [M] cluster per row
    *,
    mesh: Mesh,
    rotator,
    ex_bits: int,
    metric: Metric,
    use_t_const: bool,
    t_const: float = 0.0,
    t_rows: np.ndarray | None = None,
) -> dict:
    """Row-sharded rotate + quantize over the mesh (the multi-chip build's
    compute stage). Rotation is per-row, so the row sharding carries
    through with zero collectives. Returns host arrays in row order."""
    from ..ops.quantize import quantize_block

    m, dim = data_sorted.shape
    n_dev = mesh.shape[SHARD_AXIS]
    m_pad = ((m + n_dev - 1) // n_dev) * n_dev

    def padded(x, fill=0.0):
        out = np.full((m_pad, *x.shape[1:]), fill, x.dtype)
        out[:m] = x
        return out

    rows = padded(np.ascontiguousarray(data_sorted, np.float32))
    cents = padded(rotated_centroids[assign_sorted].astype(np.float32))
    t_pad = np.full(m_pad, t_const, np.float32)
    if t_rows is not None:
        t_pad[:m] = t_rows
    rows_sh, cents_sh, t_sh = shard_rows(mesh, rows, cents, t_pad)

    rotate = rotator.rotate if rotator is not None else (lambda x: x)

    @functools.partial(jax.jit, static_argnames=())
    def qfn(x, c, t):
        return quantize_block(
            rotate(x),
            c,
            ex_bits=ex_bits,
            metric=metric,
            t_const=t,
            use_t_const=bool((use_t_const or t_rows is not None) and ex_bits > 0),
        )

    qb = qfn(rows_sh, cents_sh, t_sh)
    out = {
        "binary": np.asarray(qb.binary)[:m].astype(np.uint8),
        "ex": np.asarray(qb.ex)[:m].astype(np.uint16),
    }
    for name in (
        "delta", "vl", "f_add", "f_rescale", "f_error", "f_add_ex",
        "f_rescale_ex", "residual_norm",
    ):
        out[name] = np.asarray(getattr(qb, name))[:m].astype(np.float32)
    return out
