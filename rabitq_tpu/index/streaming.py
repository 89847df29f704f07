"""Streamed serving for indexes larger than device memory.

The reference reserves a billion-scale tier where cold posting lists live
off-memory and are paged in on demand (``docs/MSTG_SPEC.md:44-75``,
``mstg/metadata.rs`` — scaffolding only, never implemented). This is the
TPU-native version of that tier for the IVF index: code planes stay in
host RAM as chunk slabs and stream through HBM per query batch, so index
capacity is bounded by host memory, not the ~16 GB of a chip.

Each chunk runs the full fused scan (stage-1 estimate, survivor cut,
exact re-rank) and contributes its local top-k; chunk results merge on the
host. Uploads are double-buffered: chunk i+1's slab transfers while chunk
i scans, and per-chunk results are fetched once at the end, so throughput
approaches max(transfer, compute) per chunk rather than their sum. It is
still bounded by host->device bandwidth per batch — this tier is for
batch-heavy offline serving or capacity overflow, not latency. For indexes that fit in HBM, use ``IvfRabitqIndex`` directly; for
multi-chip capacity, ``parallel.sharding.ShardedIvfIndex``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..types import Metric, SearchParams, SearchResult
from .ivf import IvfRabitqIndex, _pad_pow2
from .layout import assemble_host_chunks
from .scan import probe_k_bucket, scan_kernel


class StreamedIvfIndex:
    """Chunk-streaming wrapper over a trained ``IvfRabitqIndex``.

    ``chunk_rows`` controls the HBM working set (rows per uploaded slab).
    """

    def __init__(self, index: IvfRabitqIndex, chunk_rows: int = 1 << 20):
        self.index = index
        # fused chunks stream packed 1-bit planes (8x fewer code bytes on
        # a transfer-bound tier); the "packed" kernel has no chunked
        # variant and falls back to the dense path
        index._maybe_downgrade_fused()  # degenerate geometry -> dense path
        self._scan_dtype = "bf16" if index.scan_dtype == "packed" else index.scan_dtype
        from .scan import is_fused

        self._fused = is_fused(self._scan_dtype)
        h = index.host  # materializes host planes if the index was device-built
        n = len(index)
        unit = 512 if self._fused else 128
        chunk_rows = max(2 * unit, (chunk_rows // unit) * unit)
        self.chunk_rows = chunk_rows

        self._chunks = assemble_host_chunks(
            n=n,
            ex_bits=index.ex_bits,
            binary=h.binary_bits,
            ex=h.ex_codes,
            f_add=h.f_add,
            f_rescale=h.f_rescale,
            f_error=h.f_error,
            f_add_ex=h.f_add_ex,
            f_rescale_ex=h.f_rescale_ex,
            cluster_sizes=np.diff(h.cluster_offsets),
            ids=h.ids,
            chunk_rows=chunk_rows,
            fused=self._fused,
        )
        self._centroids = jnp.asarray(h.centroids)
        # free the wrapped index's resident HBM planes — the whole point of
        # this tier is that the index does NOT fit on the chip. (The host
        # planes stay: they back save/fetch and re-materialization.)
        index._device = None
        index._packed = None

    @property
    def n_chunks(self) -> int:
        return len(self._chunks)

    def _fused_max_tiles(self, nprobe, batch) -> int | None:
        """Per-chunk compaction budget: max over chunk slices of the local
        probed-tile bound (cached per (nprobe, batch-tile); equal-shape
        chunks share one compiled program, so one shared budget)."""
        import os

        if not self._fused or not isinstance(nprobe, (int, np.integer)):
            return None
        if os.environ.get("RABITQ_FUSED_COMPACT", "1") == "0":
            return None
        from ..ops.pallas_fused_scan import TB, sliced_max_tiles

        bt = min(TB, ((int(batch) + 31) // 32) * 32)
        key = (int(nprobe), bt)
        cache = getattr(self, "_max_tiles_cache", None)
        if cache is None:
            cache = self._max_tiles_cache = {}
        if key not in cache:
            n = len(self.index)
            slices = [
                (s, min(s + self.chunk_rows, n))
                for s in range(0, n, self.chunk_rows)
            ]
            cache[key] = sliced_max_tiles(
                np.diff(self.index.host.cluster_offsets),
                int(nprobe),
                slices,
                bt,
            )
        return cache[key]

    def batch_search_arrays(
        self,
        queries: np.ndarray,
        params: SearchParams,
        filter_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """``filter_ids`` restricts results to the given vector ids
        (``ivf.rs:1723-1730`` semantics) — the id mask chunks with the
        rows (each slab carries its own ids)."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = queries.shape[0]
        b_pad = _pad_pow2(b)
        q = np.zeros((b_pad, self.index.dim), np.float32)
        q[:b] = queries
        q_rot = self.index._rotate_jit(jnp.asarray(q))

        allowed = None
        if filter_ids is not None:
            from .ivf import allowed_id_table

            allowed = allowed_id_table(
                filter_ids, int(self.index.host.ids.max(initial=0))
            )

        # Double-buffered pipeline: while chunk i scans, chunk i+1's slab is
        # already in flight on the transfer queue (device_put is async), and
        # every per-chunk [B, k] result stays on device until one final
        # fetch. At most TWO slabs are HBM-resident at once (so the true
        # working set is 2 * chunk_rows); compute overlaps transfer instead
        # of serializing upload -> scan -> download per chunk.
        def _put(chunk):
            if allowed is not None:
                ids_np = chunk["ids"]
                ok = np.zeros(ids_np.shape[0], bool)
                in_range = (ids_np >= 0) & (ids_np < allowed.shape[0])
                ok[in_range] = allowed[ids_np[in_range]]
                chunk = {**chunk, "valid": chunk["valid"] & ok}
            return jax.device_put(chunk)  # pytree of host arrays, async

        # per-CHUNK probed-tile budget: each chunk's kernel sees only its
        # own slab, so the budget comes from the max per-chunk bound
        # (sliced_max_tiles), not the whole-index bound (which routinely
        # exceeds a chunk's tile count and used to disable compaction)
        max_tiles = self._fused_max_tiles(params.nprobe, b_pad)

        pending = []
        staged = _put(self._chunks[0])
        for i in range(len(self._chunks)):
            cur, staged = staged, None
            if i + 1 < len(self._chunks):
                staged = _put(self._chunks[i + 1])
            # fused chunks with a TOTAL refine plane omit the dense binary
            # plane from the upload (stage 2 never reads it); the scan's
            # signature still wants an array of the right shape, created
            # on device for free
            binary_c = cur.get("binary")
            if binary_c is None:
                binary_c = jnp.zeros(
                    (cur["ex"].shape[0], self.index.padded_dim), jnp.int8
                )
            ids_c, dist_c = scan_kernel(
                q_rot,
                self._centroids,
                binary_c,
                cur["ex"],
                cur["f_add"],
                cur["f_rescale"],
                cur["f_error"],
                cur["f_add_ex"],
                cur["f_rescale_ex"],
                cur["cluster_of"],
                cur["valid"],
                cur["ids"],
                packed=cur.get("packed"),
                fused_cblk=cur.get("cblk"),
                nprobe=params.nprobe,
                top_k=params.top_k,
                rerank=params.resolved_rerank(),
                metric=self.index.metric,
                ex_bits=self.index.ex_bits,
                scan_dtype=self._scan_dtype,
                approx_topk=self.index.approx_topk,
                max_tiles=max_tiles,
                probe_k=probe_k_bucket(
                    params.nprobe,
                    self.index.cluster_count(),
                    self.index.scan_dtype,
                ),
            )
            pending.append((ids_c, dist_c))
            del cur  # release the consumed slab's HBM before staging i+2

        fetched = jax.device_get(pending)  # one blocking fetch for all chunks
        all_ids = [ids_c[:b] for ids_c, _ in fetched]
        all_dists = [dist_c[:b] for _, dist_c in fetched]

        merged_ids = np.concatenate(all_ids, axis=1)
        merged_d = np.concatenate(all_dists, axis=1)
        order = np.argsort(merged_d, axis=1)[:, : params.top_k]
        return (
            np.take_along_axis(merged_ids, order, axis=1),
            np.take_along_axis(merged_d, order, axis=1),
        )

    def batch_search(
        self,
        queries: np.ndarray,
        params: SearchParams,
        filter_ids: np.ndarray | None = None,
    ) -> list[list[SearchResult]]:
        ids, dists = self.batch_search_arrays(queries, params, filter_ids)
        out = []
        for row_ids, row_d in zip(ids, dists):
            hits = []
            for i, dd in zip(row_ids, row_d):
                if i < 0 or not np.isfinite(dd):
                    continue
                score = float(dd) if self.index.metric is Metric.L2 else float(-dd)
                hits.append(SearchResult(id=int(i), score=score))
            out.append(hits)
        return out
