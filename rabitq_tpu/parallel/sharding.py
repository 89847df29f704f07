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
from ..index.scan import scan_kernel

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
    static_argnames=("mesh", "top_k", "nprobe", "rerank", "metric", "ex_bits", "scan_dtype"),
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
    *,
    mesh: Mesh,
    top_k: int,
    nprobe: int,
    rerank: int,
    metric: Metric,
    ex_bits: int,
    scan_dtype: str,
):
    """Row-sharded batched search over a device mesh.

    Same contract as ``scan_kernel`` but with the row-axis arrays sharded
    over ``mesh``. Per-device local top-k candidates are merged with one
    all_gather.
    """
    # Each device contributes its local top_k; the union of per-shard
    # top_k sets always contains the global top_k.
    local_k = top_k
    row_spec = P(SHARD_AXIS)
    row_spec2 = P(SHARD_AXIS, None)

    def per_device(q, cents, b, e, fa, fr, fe, fae, fre, cof, allow, idv):
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
            top_k=local_k,
            nprobe=nprobe,
            rerank=rerank,
            metric=metric,
            ex_bits=ex_bits,
            scan_dtype=scan_dtype,
        )
        # candidate merge over ICI: [B, local_k] -> [B, n_dev * local_k]
        all_ids = jax.lax.all_gather(loc_ids, SHARD_AXIS, axis=1, tiled=True)
        all_dist = jax.lax.all_gather(loc_dist, SHARD_AXIS, axis=1, tiled=True)
        neg, pos = jax.lax.top_k(-all_dist, top_k)
        return jnp.take_along_axis(all_ids, pos, axis=1), -neg

    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
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
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(
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
    )


class ShardedIvfIndex:
    """Row-sharded serving wrapper around a trained ``IvfRabitqIndex``.

    Shards the code planes and per-row factors across a device mesh and
    serves batched queries with one all-gather candidate merge. Build the
    index once (single chip or host), then wrap:

        mesh = sharding.make_mesh()
        sharded = sharding.ShardedIvfIndex(index, mesh)
        ids, dists = sharded.batch_search_arrays(queries, params)
    """

    def __init__(self, index, mesh: Mesh | None = None):
        import numpy as np

        self.index = index
        self.mesh = mesh or make_mesh()
        dev = index.device
        n_dev = self.mesh.shape[SHARD_AXIS]
        rows = int(dev.binary.shape[0])
        # pad rows to a multiple of the mesh size
        pad_to = ((rows + n_dev - 1) // n_dev) * n_dev

        def padded(x):
            x = np.asarray(x)
            if x.shape[0] == pad_to:
                return x
            out = np.zeros((pad_to, *x.shape[1:]), x.dtype)
            out[:rows] = x
            return out

        ids_np = np.asarray(dev.ids)
        ids_pad = np.full(pad_to, -1, np.int32)
        ids_pad[:rows] = ids_np
        self._rows = shard_rows(
            self.mesh,
            padded(dev.binary),
            padded(dev.ex),
            padded(dev.f_add),
            padded(dev.f_rescale),
            padded(dev.f_error),
            padded(dev.f_add_ex),
            padded(dev.f_rescale_ex),
            padded(dev.cluster_of),
            padded(dev.valid),
            ids_pad,
        )
        (self._centroids,) = replicate(self.mesh, np.asarray(dev.centroids))

    def batch_search_arrays(self, queries, params):
        import numpy as np
        import jax.numpy as jnp

        queries = np.atleast_2d(np.asarray(queries, np.float32))
        q_rot = self.index._rotate_jit(jnp.asarray(queries))
        (q_rep,) = replicate(self.mesh, np.asarray(q_rot))
        ids, dists = sharded_scan(
            q_rep,
            self._centroids,
            *self._rows,
            mesh=self.mesh,
            top_k=params.top_k,
            nprobe=params.nprobe,
            rerank=params.resolved_rerank(),
            metric=self.index.metric,
            ex_bits=self.index.ex_bits,
            # the packed bitplane is not sharded; fall back to the dense path
            scan_dtype="bf16" if self.index.scan_dtype == "packed" else self.index.scan_dtype,
        )
        return jax.device_get((ids, dists))


@functools.partial(jax.jit, static_argnames=("mesh", "k", "block"))
def sharded_kmeans_step(
    data: jax.Array, centroids: jax.Array, *, mesh: Mesh, k: int, block: int
):
    """One data-parallel Lloyd iteration over the mesh: local GEMM
    assignment + segment sums, then psum of (sums, counts) over ICI — the
    multi-chip analogue of ``ops/kmeans._lloyd_step``."""
    from ..ops.kmeans import _assign_blocks

    def per_device(x, c):
        assign, dists = _assign_blocks(x, c, block)
        sums = jax.ops.segment_sum(x, assign, num_segments=k)
        counts = jax.ops.segment_sum(
            jnp.ones((x.shape[0],), jnp.float32), assign, num_segments=k
        )
        sums = jax.lax.psum(sums, SHARD_AXIS)
        counts = jax.lax.psum(counts, SHARD_AXIS)
        return sums, counts, assign

    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P()),
        out_specs=(P(), P(), P(SHARD_AXIS)),
        check_vma=False,
    )(data, centroids)
