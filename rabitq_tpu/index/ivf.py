"""IVF + RaBitQ index (TPU-native).

API parity with the reference ``IvfRabitqIndex`` (lqhl/rabitq-rs
``src/ivf.rs``): train / train_with_clusters / search / search_filtered /
batch_search / save_to_path / load_from_path / fetch_embedding.

Architecture (deliberately *not* the CPU layout):

* build — k-means runs as on-device GEMM Lloyd iterations
  (``ops/kmeans.py``), rotation and quantization are chunked, fully
  vectorized device passes (vs. the reference's rayon per-vector loops,
  ``ivf.rs:1004-1007, 1157-1183``).
* storage — codes live in HBM as dense int8 planes ``[N, Dpad]`` sorted by
  cluster, plus flat per-row factor vectors; clusters are ranges in that
  order (``cluster_offsets``). There is no 32-vector nibble transpose on
  device: that layout exists only to feed AVX shuffles and is produced
  on demand by the persistence codec (``io/persistence.py``).
* search — one fused XLA program per query batch (``index/scan.py``).

Persistence is byte-compatible RBQ1 v3 (``ivf.rs:1310-1702``).
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import DimensionMismatch, EmptyIndex, InvalidConfig
from ..types import Metric, RotatorType, SearchParams, SearchResult
from ..ops import kmeans as kmeans_ops
from ..ops import packing
from ..ops.quantize import compute_const_scaling_factor
from ..ops.rotation import Rotator, make_rotator
from ..utils.logging import get_logger, timed
from .layout import _ROW_PAD, DeviceLayout, assemble_device_layout
from .scan import (
    ex_plane_is_total,
    make_fused_search,
    pack_int4_queries,
    probe_k_bucket,
)

_log = get_logger("ivf")


def _pad_pow2(b: int) -> int:
    """Round a batch size up to a power of two to bound recompiles."""
    p = 1
    while p < b:
        p *= 2
    return p


def allowed_id_table(filter_ids: np.ndarray, max_id: int) -> np.ndarray:
    """Allowed-id set -> bool lookup over the id domain [0, max_id]
    (``ivf.rs:1723-1730`` filter semantics; accepts an id array or a bool
    mask over the id domain)."""
    filter_ids = np.asarray(filter_ids)
    if filter_ids.dtype == bool:
        return filter_ids
    table = np.zeros(max_id + 1, bool)
    in_range = filter_ids[(filter_ids >= 0) & (filter_ids <= max_id)]
    table[in_range.astype(np.int64)] = True
    return table


@dataclass
class HostCodes:
    """Host-resident canonical storage (cluster-sorted row order)."""

    binary_bits: np.ndarray  # [N, Dpad] uint8 {0,1}
    ex_codes: np.ndarray  # [N, Dpad] uint16
    f_add: np.ndarray  # [N] f32
    f_rescale: np.ndarray
    f_error: np.ndarray
    f_add_ex: np.ndarray
    f_rescale_ex: np.ndarray
    delta: np.ndarray
    vl: np.ndarray
    ids: np.ndarray  # [N] int64 original vector ids
    cluster_offsets: np.ndarray  # [C+1] int64 row ranges per cluster
    centroids: np.ndarray  # [C, Dpad] f32 (rotated space)


# Device-resident arrays used by the scan kernel: the shared assembler's
# DeviceLayout (index/layout.py) — one layout builder for every engine.
DeviceIndex = DeviceLayout


class IvfRabitqIndex:
    def __init__(
        self,
        dim: int,
        padded_dim: int,
        metric: Metric,
        rotator: Rotator,
        ex_bits: int,
        host: HostCodes | None,
        scan_dtype: str = "bf16",
        approx_topk: bool | None = None,
    ):
        self.dim = dim
        self.padded_dim = padded_dim
        self.metric = metric
        self.rotator = rotator
        self.ex_bits = ex_bits
        # host code arrays may be lazily materialized from the device copy
        # (downloads through the TPU tunnel are slow; only save/fetch need them)
        self._host = host
        self._ids = host.ids if host is not None else None
        self._offsets = host.cluster_offsets if host is not None else None
        self._centroids_np = host.centroids if host is not None else None
        self.scan_dtype = scan_dtype
        # approximate survivor selection is the fast path; the f32 oracle
        # configuration (used by parity tests) defaults to exact selection
        self.approx_topk = approx_topk if approx_topk is not None else scan_dtype != "f32"
        self._device: DeviceIndex | None = None
        self._device_perm: np.ndarray | None = None
        self._packed: jax.Array | None = None  # bitplane plane (scan_dtype="packed")
        # "bf16" halves query-upload bytes over the host link (rounding is
        # 2^-9 relative — below the bf16 scan's own operand rounding);
        # "int8" quarters them (per-query scale), "int4" packs nibble
        # pairs for an eighth; the fused program decodes back to f32
        # before rotating.
        self.upload_dtype: str = "f32"
        self.build_report: dict | None = None  # phase timings (train only)
        self._device_mode: str | None = None  # see _layout_mode
        self._fused_cblk: jax.Array | None = None
        # Persistent jit wrappers — constructing jax.jit per call would
        # retrace and recompile on every search. The fused program runs
        # rotation + scan in ONE device dispatch (see scan.make_fused_search).
        self._rotate_jit = jax.jit(self.rotator.rotate)
        self._fused_scan = make_fused_search(self.rotator.rotate, dim=self.dim)

    @property
    def host(self) -> HostCodes:
        if self._host is None:
            self._host = self._download_host()
        return self._host

    def _download_host(self, dev: DeviceIndex | None = None) -> HostCodes:
        """Materialize host code arrays from the device copy (inverse of the
        device row permutation)."""
        dev = dev if dev is not None else self.device
        n = int(self._ids.shape[0])
        # the row stored at host position r sits at device position
        # pos_of_row[r] (inverse of the device permutation)
        pos_of_row = np.empty_like(self._device_perm)
        pos_of_row[self._device_perm] = np.arange(self._device_perm.shape[0])
        take = jnp.asarray(pos_of_row[:n])
        with timed(f"download host codes n={n}", _log):
            # fused layouts width-pad the refine plane to 128 lanes
            # (layout.py): slice the zero columns back off
            ex = np.asarray(jnp.take(dev.ex, take, axis=0))[
                :, : self.padded_dim
            ].astype(np.uint16)
            if dev.binary is not None:
                binary = np.asarray(jnp.take(dev.binary, take, axis=0)).astype(np.uint8)
            else:
                # fused layout dropped the dense plane: the refine plane
                # holds TOTAL codes, so binary = total >> ex_bits
                binary = (ex >> self.ex_bits).astype(np.uint8)
            if ex_plane_is_total(self.ex_bits):
                # the device refine plane stores total codes; recover ex
                ex = (ex.astype(np.int32) - (binary.astype(np.int32) << self.ex_bits)).astype(np.uint16)
            scalars = {
                name: np.asarray(jnp.take(getattr(dev, name), take)).astype(np.float32)
                for name in ("f_add", "f_rescale", "f_error", "f_add_ex", "f_rescale_ex")
            }
            delta = np.asarray(jnp.take(dev.delta, take)).astype(np.float32)
            vl = np.asarray(jnp.take(dev.vl, take)).astype(np.float32)
        return HostCodes(
            binary_bits=binary,
            ex_codes=ex,
            delta=delta,
            vl=vl,
            ids=self._ids,
            cluster_offsets=self._offsets,
            centroids=self._centroids_np,
            **scalars,
        )

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def train(
        cls,
        data: np.ndarray,
        nlist: int,
        total_bits: int,
        metric: Metric = Metric.L2,
        rotator_type: RotatorType = RotatorType.FhtKacRotator,
        seed: int = 42,
        use_faster_config: bool = False,
        kmeans_iters: int = 30,
        scan_dtype: str = "bf16",
        data_upload: str = "auto",
        kmeans_dtype: str = "auto",
        kmeans_tol: float = 1e-3,
    ) -> "IvfRabitqIndex":
        """Train from scratch (``ivf.rs:950-1021``): k-means on the original
        data, rotate, quantize residuals per cluster.

        ``data_upload`` selects the dataset's host->device encoding
        (``utils/transfer.py``): "auto" sends large datasets bf16 —
        half the tunnel bytes, rounding far below code quantization
        noise — and small ones exact f32. ``kmeans_dtype`` picks the
        assignment-matmul operand precision the same way ("auto": bf16
        above ~64M elements, f32 below — ``ops.kmeans.auto_assign_dtype``);
        ``kmeans_tol`` stops Lloyd early when the relative objective
        improvement falls below it (0 restores the reference's fixed
        iteration count, ``kmeans.rs:291``).
        """
        from ..utils.transfer import upload_dataset

        data = np.asarray(data)
        if data.dtype != np.float32:
            # keep f32 inputs as-is (mmap-backed bench datasets must not be
            # copied into RAM); chunked consumers convert per block
            data = np.ascontiguousarray(data, np.float32)
        cls._validate_train_args(data, nlist, total_bits)
        import time as _time

        t0 = _time.time()
        data_dev, upload_report = upload_dataset(data, data_upload)
        _log.info("upload dataset: %s", upload_report)
        t_upload = _time.time()
        if kmeans_dtype == "auto":
            kmeans_dtype = kmeans_ops.auto_assign_dtype(*data.shape)
        with timed(f"kmeans n={data.shape[0]} k={nlist}", _log):
            km = kmeans_ops.run_kmeans(
                data, nlist, niter=kmeans_iters, seed=seed, data_dev=data_dev,
                assign_dtype=kmeans_dtype, tol=kmeans_tol, with_report=True,
            )
        t_kmeans = _time.time()
        index = cls._build(
            data,
            km.centroids,
            km.assignments,
            total_bits,
            metric,
            rotator_type,
            seed,
            use_faster_config,
            scan_dtype,
            data_dev=data_dev,
        )
        index.build_report = {
            "upload": upload_report,
            "upload_s": round(t_upload - t0, 2),
            "kmeans_s": round(t_kmeans - t_upload, 2),
            # sub-decomposition (VERDICT r4 weak-3): init vs Lloyd steps
            # vs the final full-dataset assignment, + iterations run
            "kmeans": {**(km.report or {}), "iters": km.iters},
            "quantize_s": round(_time.time() - t_kmeans, 2),
            "total_s": round(_time.time() - t0, 2),
        }
        return index

    @classmethod
    def train_with_clusters(
        cls,
        data: np.ndarray,
        centroids: np.ndarray,
        assignments: np.ndarray,
        total_bits: int,
        metric: Metric = Metric.L2,
        rotator_type: RotatorType = RotatorType.FhtKacRotator,
        seed: int = 42,
        use_faster_config: bool = False,
        scan_dtype: str = "bf16",
    ) -> "IvfRabitqIndex":
        """Build with externally provided clustering (``ivf.rs:1025-1103``)."""
        data = np.ascontiguousarray(data, np.float32)
        centroids = np.ascontiguousarray(centroids, np.float32)
        assignments = np.asarray(assignments, np.int64)
        if data.size == 0:
            raise InvalidConfig("training data must be non-empty")
        if centroids.size == 0:
            raise InvalidConfig("centroids must be non-empty")
        if assignments.shape[0] != data.shape[0]:
            raise InvalidConfig("assignments length must match data length")
        if not (1 <= total_bits <= 16):
            raise InvalidConfig("total_bits must be between 1 and 16")
        if centroids.shape[1] != data.shape[1]:
            raise InvalidConfig("centroids must match the data dimensionality")
        if centroids.shape[0] > data.shape[0]:
            raise InvalidConfig("nlist cannot exceed number of vectors")
        if assignments.min(initial=0) < 0 or assignments.max(initial=0) >= centroids.shape[0]:
            raise InvalidConfig("assignments reference invalid cluster ids")
        return cls._build(
            data,
            centroids,
            assignments,
            total_bits,
            metric,
            rotator_type,
            seed,
            use_faster_config,
            scan_dtype,
        )

    @staticmethod
    def _validate_train_args(data: np.ndarray, nlist: int, total_bits: int) -> None:
        if data.size == 0:
            raise InvalidConfig("training data must be non-empty")
        if nlist <= 0:
            raise InvalidConfig("nlist must be positive")
        if not (1 <= total_bits <= 16):
            raise InvalidConfig("total_bits must be between 1 and 16")
        if nlist > data.shape[0]:
            raise InvalidConfig("nlist cannot exceed number of vectors")

    @classmethod
    def _build(
        cls,
        data: np.ndarray,
        centroids: np.ndarray,
        assignments: np.ndarray,
        total_bits: int,
        metric: Metric,
        rotator_type: RotatorType,
        seed: int,
        use_faster_config: bool,
        scan_dtype: str,
        data_dev: jax.Array | None = None,
    ) -> "IvfRabitqIndex":
        n, dim = data.shape
        nlist = centroids.shape[0]
        ex_bits = total_bits - 1
        rotator = make_rotator(dim, rotator_type, seed)
        padded_dim = rotator.padded_dim

        with timed("rotate centroids", _log):
            rotated_centroids = np.asarray(jax.jit(rotator.rotate)(jnp.asarray(centroids)))

        # cluster-sorted row order; within a cluster keep ascending original id
        # (matches the reference's grouping loop, ivf.rs:1141-1149)
        order = np.argsort(assignments, kind="stable")
        sizes = np.bincount(assignments, minlength=nlist)
        offsets = np.zeros(nlist + 1, np.int64)
        np.cumsum(sizes, out=offsets[1:])

        t_const = 0.0
        t_rows = None
        if ex_bits > 0:
            if use_faster_config:
                t_const = compute_const_scaling_factor(padded_dim, ex_bits, seed)
            else:
                # reference default: exact per-vector t sweep (quantizer.rs:332)
                from .build import exact_t_rows

                with timed("exact t sweep", _log):
                    t_rows = exact_t_rows(
                        data, centroids, assignments[order], order, rotator, ex_bits
                    )

        from .build import build_codes_device

        with timed("quantize+rotate codes", _log):
            codes_dev, _ = build_codes_device(
                data_dev if data_dev is not None else data,
                rotated_centroids,
                assignments[order],
                rotator=rotator,
                ex_bits=ex_bits,
                metric=metric,
                use_t_const=use_faster_config,
                t_const=t_const,
                t_rows=t_rows,
                order=order,
            )
        index = cls(dim, padded_dim, metric, rotator, ex_bits, host=None,
                    scan_dtype=scan_dtype)
        index._ids = order.astype(np.int64)
        index._offsets = offsets
        index._centroids_np = rotated_centroids
        index._device = index._device_from_codes(codes_dev, n)
        return index

    def _device_from_codes(self, codes_dev: dict, n: int) -> DeviceIndex:
        """Assemble the padded+permuted DeviceIndex from device-resident
        build outputs (no host round trip; layout.py trims the chunk
        padding from build_codes_device)."""
        lay = assemble_device_layout(
            n=n,
            ex_bits=self.ex_bits,
            binary=codes_dev["binary"],
            ex=codes_dev["ex"],
            f_add=codes_dev["f_add"],
            f_rescale=codes_dev["f_rescale"],
            f_error=codes_dev["f_error"],
            f_add_ex=codes_dev["f_add_ex"],
            f_rescale_ex=codes_dev["f_rescale_ex"],
            cluster_sizes=np.diff(self._offsets),
            ids=self._ids,
            centroids=jnp.asarray(self._centroids_np),
            delta=codes_dev["delta"],
            vl=codes_dev["vl"],
            **self._layout_kwargs(),
        )
        self._device_perm = lay.perm
        self._device_mode = self._layout_mode()
        return lay

    # ------------------------------------------------------------------
    # device materialization
    # ------------------------------------------------------------------

    @property
    def device(self) -> DeviceIndex:
        if self._device is not None and self._device_mode != self._layout_mode():
            # scan_dtype switched layout modes (fused <-> approx): download
            # host planes through the OLD layout first, then rebuild
            if self._host is None:
                self._host = self._download_host(self._device)
            self._device = None
        if self._device is None:
            self._device = self._to_device()
        return self._device

    def _layout_mode(self) -> str:
        """'sorted' (cluster-contiguous, TN-padded — fused Pallas scan) or
        'perm' (pseudorandom scatter — approx_max_k paths)."""
        from .scan import is_fused

        return "sorted" if is_fused(self.scan_dtype) else "perm"

    def _layout_kwargs(self) -> dict:
        if self._layout_mode() == "sorted":
            from ..ops.pallas_fused_scan import TN

            return {"permute": False, "row_pad": TN}
        return {}

    def _to_device(self) -> DeviceIndex:
        h = self.host
        n = h.binary_bits.shape[0]
        lay = assemble_device_layout(
            n=n,
            ex_bits=self.ex_bits,
            binary=h.binary_bits,
            ex=h.ex_codes,
            f_add=h.f_add,
            f_rescale=h.f_rescale,
            f_error=h.f_error,
            f_add_ex=h.f_add_ex,
            f_rescale_ex=h.f_rescale_ex,
            cluster_sizes=np.diff(h.cluster_offsets),
            ids=h.ids,
            centroids=h.centroids,
            delta=h.delta,
            vl=h.vl,
            **self._layout_kwargs(),
        )
        self._device_perm = lay.perm
        self._device_mode = self._layout_mode()
        self._packed = None  # plane layouts differ per mode
        self._fused_cblk = None
        return lay

    # ------------------------------------------------------------------
    # basic accessors (ivf.rs:1217-1230)
    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return int(self._ids.shape[0])

    @property
    def is_empty(self) -> bool:
        return len(self) == 0

    def cluster_count(self) -> int:
        return int(self._offsets.shape[0] - 1)

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------

    def search(self, query: np.ndarray, params: SearchParams) -> list[SearchResult]:
        """Single-query search (``ivf.rs:1705-1711``)."""
        return self.batch_search(np.asarray(query, np.float32)[None, :], params)[0]

    def search_filtered(
        self, query: np.ndarray, params: SearchParams, filter_ids: np.ndarray
    ) -> list[SearchResult]:
        """Filtered search (``ivf.rs:1723-1730``): only ids present in
        ``filter_ids`` (array of allowed vector ids, or boolean mask over
        the id domain) may be returned."""
        return self.batch_search(
            np.asarray(query, np.float32)[None, :], params, filter_ids=filter_ids
        )[0]

    def batch_search(
        self,
        queries: np.ndarray,
        params: SearchParams,
        filter_ids: np.ndarray | None = None,
    ) -> list[list[SearchResult]]:
        """Batched search — the primary TPU entry point (replaces the
        rayon-over-queries ``batch_search``, ``ivf.rs:1743-1752``)."""
        ids, dists = self.batch_search_arrays(queries, params, filter_ids)
        out: list[list[SearchResult]] = []
        for row_ids, row_d in zip(ids, dists):
            hits = []
            for i, dd in zip(row_ids, row_d):
                if i < 0 or not np.isfinite(dd):
                    continue
                score = float(dd) if self.metric is Metric.L2 else float(-dd)
                hits.append(SearchResult(id=int(i), score=score))
            out.append(hits)
        return out

    def batch_search_arrays(
        self,
        queries: np.ndarray,
        params: SearchParams,
        filter_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Array-in / array-out search: returns (ids [B, k] int32 with -1
        padding, dist [B, k] f32 internal distances)."""
        if self.is_empty:
            raise EmptyIndex()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, queries.shape[1])
        if params.top_k <= 0:
            b = queries.shape[0]
            return (np.full((b, 0), -1, np.int32), np.full((b, 0), np.inf, np.float32))

        dev, packed, row_allowed = self._scan_inputs(filter_ids)
        b = queries.shape[0]
        # rotation + scan in one device program, the query passed as a host
        # array so its upload rides the same dispatch: ONE tunnel round trip
        ids, dists = self._dispatch_scan(
            self._pad_queries(queries, _pad_pow2(b)), params, dev, packed, row_allowed
        )
        # one fetch for both outputs: a second np.asarray costs another
        # ~30 ms tunnel round trip
        ids, dists = jax.device_get((ids, dists))
        return ids[:b], dists[:b]

    def upload_queries(self, queries: np.ndarray):
        """Device-resident query cache: encode + upload ONCE, then rerun
        searches over the same queries with ``batch_search_resident`` —
        a parameter sweep pays the query transfer a single time instead
        of once per configuration (the upload is ~quarter of the serving
        budget at the 1M headline point). Encoded with the CURRENT
        ``upload_dtype``; returns an opaque handle."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, queries.shape[1])
        b_total = queries.shape[0]
        ub = _pad_pow2(b_total)
        return (jax.device_put(self._pad_queries(queries, ub)), b_total, ub)

    def batch_search_resident(
        self,
        qcache,
        params: SearchParams,
        batch_size: int = 256,
        filter_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """``batch_search_arrays`` over an ``upload_queries`` handle: all
        dispatches slice the resident superblock at traced offsets — zero
        query bytes cross the host link. Results are identical to the
        upload paths on the same ``upload_dtype``."""
        if self.is_empty:
            raise EmptyIndex()
        cur, b_total, ub = qcache
        if params.top_k <= 0:
            return (
                np.full((b_total, 0), -1, np.int32),
                np.full((b_total, 0), np.inf, np.float32),
            )
        dev, packed, row_allowed = self._scan_inputs(filter_ids)
        bs = _pad_pow2(min(batch_size, ub))
        pending = [
            self._dispatch_scan(
                cur, params, dev, packed, row_allowed,
                offset=np.int32(off), sub_block=bs,
            )
            for off in range(0, b_total, bs)
        ]
        fetched = jax.device_get(pending)
        ids = np.concatenate([f[0] for f in fetched])[:b_total]
        dists = np.concatenate([f[1] for f in fetched])[:b_total]
        return ids, dists

    def batch_search_arrays_pipelined(
        self,
        queries: np.ndarray,
        params: SearchParams,
        batch_size: int = 1024,
        filter_ids: np.ndarray | None = None,
        upload_block: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Array search over many fixed-size blocks with upload/compute
        overlap — the serving-loop analogue of the streamed tier's double
        buffering.

        Every put and dispatch is async: the loop issues block i's upload
        immediately followed by its scan, and fetches every block's small
        ``[batch, k]`` result in ONE final ``device_get`` — uploads and
        scans of different blocks overlap in the runtime without any
        client-side staging. (An earlier version staged block i+1's put
        BEFORE dispatching block i; on the serialized tunnel service
        queue that only delays dispatches — measured eager 13569 vs
        staged 12782 median QPS at the 1M headline point, and the
        superblock/puts-first orderings are worse still, BENCHMARKS.md
        "Dispatch ordering".) Results are identical to
        ``batch_search_arrays``; all blocks share one compiled program.

        ``upload_block`` (>= batch_size) decouples put granularity from
        dispatch granularity: queries transfer in superblocks of that many
        rows (one ``device_put`` each) while scans still run per
        ``batch_size`` window, sliced on device at a traced offset.
        1024 is the measured serving default since round 4 (BENCHMARKS.md
        "Superblock uploads, revisited": with ~3.5 ms exact-scan
        dispatches serving is upload-bound, so fewer, larger puts win —
        18.6k -> 23.6k pipelined / 34.1k sustained QPS at the 1M
        headline; the round-3 negative was a slow-dispatch artifact).
        """
        if self.is_empty:
            raise EmptyIndex()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, queries.shape[1])
        b_total = queries.shape[0]
        if params.top_k <= 0:
            return (
                np.full((b_total, 0), -1, np.int32),
                np.full((b_total, 0), np.inf, np.float32),
            )
        dev, packed, row_allowed = self._scan_inputs(filter_ids)
        bs = _pad_pow2(min(batch_size, _pad_pow2(b_total)))
        pending = []
        if upload_block is not None:
            ub = _pad_pow2(min(max(upload_block, bs), _pad_pow2(b_total)))
            for s in range(0, b_total, ub):
                cur = jax.device_put(self._pad_queries(queries[s : s + ub], ub))
                for off in range(0, min(ub, b_total - s), bs):
                    pending.append(
                        self._dispatch_scan(
                            cur, params, dev, packed, row_allowed,
                            offset=np.int32(off), sub_block=bs,
                        )
                    )
        else:
            for s in range(0, b_total, bs):
                cur = jax.device_put(self._pad_queries(queries[s : s + bs], bs))
                pending.append(
                    self._dispatch_scan(cur, params, dev, packed, row_allowed)
                )
        fetched = jax.device_get(pending)
        # valid rows sit at the head of each block; only the last is short
        ids = np.concatenate([f[0] for f in fetched])[:b_total]
        dists = np.concatenate([f[1] for f in fetched])[:b_total]
        return ids, dists

    def _maybe_downgrade_fused(self) -> None:
        """Fused kernels need cluster-sorted tiles spanning <=128 clusters;
        degenerate geometries (average cluster < TN/128 rows) fall back to
        the dense bf16 path instead of crashing at cblk construction."""
        from .scan import is_fused

        if not is_fused(self.scan_dtype):
            return
        key = id(self._offsets)
        cache = getattr(self, "_fused_ok_cache", None)
        if cache is None or cache[0] != key:
            from ..ops.pallas_fused_scan import (
                fused_fits_vmem,
                fused_geometry_ok,
            )

            plane_w = self.padded_dim + (-self.padded_dim) % 128
            ok = fused_geometry_ok(np.diff(self._offsets)) and fused_fits_vmem(
                plane_w, direct=False, int8_q=self.scan_dtype == "fused8"
            )
            cache = (key, ok)
            self._fused_ok_cache = cache
        if not cache[1]:
            _log.warning(
                "geometry unsuited for scan_dtype=%r (a row tile would "
                "span >128 clusters, or the tile footprint exceeds the "
                "VMEM budget at this dim); falling back to bf16",
                self.scan_dtype,
            )
            self.scan_dtype = "bf16"

    def _scan_inputs(self, filter_ids: np.ndarray | None):
        """Device layout + packed plane + row mask shared by search paths."""
        self._maybe_downgrade_fused()
        dev = self.device
        packed = None
        from .scan import is_fused

        if self.scan_dtype == "packed" or is_fused(self.scan_dtype):
            if self._packed is None:
                if dev.packed is not None:  # fused layouts pre-pack
                    self._packed = dev.packed
                else:
                    from ..ops.pallas_scan import pack_bitplanes

                    self._packed = pack_bitplanes(dev.binary, self.padded_dim)
            packed = self._packed
        if is_fused(self.scan_dtype) and self._fused_cblk is None:
            from ..ops.pallas_fused_scan import tile_cluster_blocks
            from .layout import cluster_of_rows

            n = len(self)
            n_pad = int(dev.ids.shape[0])
            cluster_of = cluster_of_rows(np.diff(self._offsets), n_pad)
            valid = np.arange(n_pad) < n
            self._fused_cblk = jnp.asarray(tile_cluster_blocks(cluster_of, valid))
        row_allowed = dev.valid
        if filter_ids is not None:
            mask = self._row_filter(filter_ids)
            row_allowed = row_allowed & jnp.asarray(mask)
        return dev, packed, row_allowed

    def _fused_max_tiles(self, nprobe, batch: int | None = None) -> int | None:
        """Static probed-tile budget for the fused kernel's compaction.

        None disables compaction (dense tile walk). Enabled when the safe
        per-block bound (``probed_tile_bound``) is under half the tile
        count — at the 1M/nprobe=4 operating point ~99% of stage-1 MXU
        work lands on masked rows otherwise (the reference only ever scans
        probed clusters, ``ivf.rs:1847-1872``). The bound is bucketed to a
        power of two so nprobe sweeps compile at most log2(T) variants.
        """
        from .scan import is_fused

        if not is_fused(self.scan_dtype) or not isinstance(nprobe, (int, np.integer)):
            return None
        import os

        compact_env = os.environ.get("RABITQ_FUSED_COMPACT", "1")
        if compact_env == "0":
            return None
        from ..ops.pallas_fused_scan import (
            TB,
            TN,
            expected_tile_cost,
            probed_tile_bound,
        )

        from .layout import pad_rows

        # the kernel's query tile is min(TB, ceil32(batch)): smaller
        # batches have proportionally smaller per-block cluster unions
        bt = TB if batch is None else min(TB, ((int(batch) + 31) // 32) * 32)
        key = (id(self._offsets), int(nprobe), bt)
        cache = getattr(self, "_max_tiles_cache", None)
        if cache is None:
            cache = self._max_tiles_cache = {}
        if key not in cache:
            n_tiles = pad_rows(len(self), TN) // TN
            sizes = np.diff(self._offsets)
            # gate on the EXPECTED tile count; size by the SAFE bound
            # (capped at n_tiles — a full-length needed-first list is
            # still a win: padding slots repeat the last tile, so skipped
            # grid steps do no DMA and no compute)
            exp = expected_tile_cost(sizes, int(nprobe), batch_tile=bt)
            if compact_env == "force":
                # experiment knob (see the MSTG twin): full-length list
                # regardless of the expected-cost gate
                cache[key] = n_tiles
            elif exp >= 0.6 * n_tiles:
                cache[key] = None  # most tiles probed anyway: dense walk
            else:
                bound = probed_tile_bound(sizes, int(nprobe), batch_tile=bt)
                cache[key] = min(1 << (bound - 1).bit_length(), n_tiles)
        return cache[key]

    def _gather_budget(self, nprobe) -> int | None:
        """Static per-query row budget for the gather scan, or None to
        use the fused/dense stage-1. OPT-IN (``RABITQ_GATHER=1``).

        MEASURED NEGATIVE at the 1M headline point (BENCHMARKS.md
        "Gather scan", tools/gather_probe.py): the per-query row-gather
        idea loses 17x to the fused bin-scan (242 vs 14 ms per b=256
        dispatch) because XLA's TPU gather runs at a fixed ELEMENT rate
        (~10G elem/s), not HBM byte rate — a [256, 8192, 960] int8
        gather is 2G elements. The int32-bitcast trick (:func:`take_rows`)
        recovers 4x but the bin-scan still wins ~4x. Kept opt-in: the
        path is exact (recall 0.9756 vs fused 0.9753 measured), the CPU
        tests pin its semantics, and a future XLA gather fast-path would
        make it the better scan at small nprobe. The gate is the
        pow2-bucketed safe bound (sum of the ``nprobe`` largest clusters
        — never truncates), capped by ``RABITQ_GATHER_MAX`` (16384)."""
        import os

        from .scan import ex_plane_is_total, gather_budget_bucket, is_fused

        if os.environ.get("RABITQ_GATHER", "0") != "1":
            return None
        # needs cluster-sorted device rows (fused layouts) + TOTAL plane
        if not is_fused(self.scan_dtype) or not ex_plane_is_total(self.ex_bits):
            return None
        key = (id(self._offsets), nprobe if isinstance(nprobe, int) else None)
        cache = getattr(self, "_gather_cache", None)
        if cache is None:
            cache = self._gather_cache = {}
        if key not in cache:
            bucket = gather_budget_bucket(np.diff(self._offsets), nprobe)
            limit = int(os.environ.get("RABITQ_GATHER_MAX", "16384"))
            n_rows = len(self)
            if bucket is None or bucket > limit or 2 * bucket >= n_rows:
                bucket = None
            cache[key] = bucket
        return cache[key]

    def _cluster_ranges(self):
        """Device [C] start/size arrays for the gather scan (cached)."""
        cur = getattr(self, "_cl_ranges", None)
        if cur is None or cur[0] != id(self._offsets):
            starts = jnp.asarray(self._offsets[:-1], jnp.int32)
            sizes = jnp.asarray(np.diff(self._offsets), jnp.int32)
            self._cl_ranges = cur = (id(self._offsets), starts, sizes)
        return cur[1], cur[2]

    def _fused_exact_ok(self) -> bool:
        """Whether the fused scan can run in EXACT mode: stream the int8
        TOTAL plane through the bin kernel with the extended factors and
        skip the stage-2 survivor gather (the serving dispatch's measured
        dominant term). Needs the TOTAL refine plane and a 128-aligned
        plane width; ``RABITQ_FUSED_EXACT=0`` falls back to the
        two-stage scan."""
        import os

        from .scan import ex_plane_is_total, is_fused

        if os.environ.get("RABITQ_FUSED_EXACT", "1") == "0":
            return False
        from ..ops.pallas_fused_scan import fused_fits_vmem

        # the fused device layout width-pads the refine plane to 128
        # lanes (layout.py), so any quant dim is eligible — but the dense
        # total plane's [TN, Dpad] tiles must fit VMEM (high-dim configs
        # fall back to the two-stage scan, whose packed tiles are 8x
        # narrower; tests/test_highdim.py)
        plane_w = self.padded_dim + (-self.padded_dim) % 128
        return (
            is_fused(self.scan_dtype)
            and ex_plane_is_total(self.ex_bits)
            and fused_fits_vmem(plane_w, direct=True)
        )

    def _pad_queries(self, queries: np.ndarray, b_pad: int):
        """Returns (q_padded, qscale | None) in the upload encoding."""
        q = np.zeros((b_pad, self.dim), np.float32)
        q[: queries.shape[0]] = queries
        if self.upload_dtype == "bf16":
            import ml_dtypes

            return q.astype(ml_dtypes.bfloat16), None
        if self.upload_dtype == "int8":
            # symmetric per-query quantization: 4x fewer upload bytes;
            # ~0.4% relative rounding on raw coordinates — below the 7-bit
            # code quantization noise (recall-checked in tests)
            scale = np.maximum(np.abs(q).max(axis=1), 1e-30) / 127.0
            q_i8 = np.clip(np.rint(q / scale[:, None]), -127, 127).astype(np.int8)
            return q_i8, scale.astype(np.float32)
        if self.upload_dtype == "int4":
            return pack_int4_queries(q)
        return q, None

    def _dispatch_scan(
        self,
        q_padded,
        params,
        dev,
        packed,
        row_allowed,
        offset=None,
        sub_block=None,
    ):
        """Enqueue rotation+scan on a padded query block ((q, qscale) from
        ``_pad_queries``); returns device arrays (callers fetch — lets
        serving loops pipeline). With ``sub_block``, ``q`` is a resident
        upload superblock and the scan covers the window at ``offset``."""
        q, qscale = q_padded
        b = sub_block if sub_block is not None else q.shape[0]
        gather_rows = self._gather_budget(params.nprobe)
        cl_starts = cl_sizes = None
        if gather_rows is not None:
            cl_starts, cl_sizes = self._cluster_ranges()
        return self._fused_scan(
            q,
            dev.centroids,
            dev.binary,
            dev.ex,
            dev.f_add,
            dev.f_rescale,
            dev.f_error,
            dev.f_add_ex,
            dev.f_rescale_ex,
            dev.cluster_of,
            row_allowed,
            dev.ids,
            qscale=qscale,
            offset=offset,
            sub_block=sub_block,
            packed=packed,
            fused_cblk=self._fused_cblk,
            cl_starts=cl_starts,
            cl_sizes=cl_sizes,
            top_k=params.top_k,
            nprobe=params.nprobe,
            rerank=params.resolved_rerank(),
            metric=self.metric,
            ex_bits=self.ex_bits,
            scan_dtype=self.scan_dtype,
            approx_topk=self.approx_topk,
            max_tiles=(
                None
                if gather_rows is not None
                else self._fused_max_tiles(params.nprobe, batch=b)
            ),
            probe_k=probe_k_bucket(params.nprobe, self.cluster_count(), self.scan_dtype),
            gather_rows=gather_rows,
            fused_exact=self._fused_exact_ok(),
            locality_depth=int(os.environ.get("RABITQ_LOCALITY", "1")),
        )

    def search_with_diagnostics(
        self, query: np.ndarray, params: SearchParams
    ) -> tuple[list[SearchResult], "SearchDiagnostics"]:
        """Search plus scan counters MEASURED from the kernel's masks —
        on the fused path, from counters inside the production Pallas
        kernel itself (reference test accessor ``ivf.rs:2131-2140``)."""
        from ..types import SearchDiagnostics

        dev, packed, row_allowed = self._scan_inputs(None)
        q = np.zeros((1, self.dim), np.float32)
        q[0] = np.asarray(query, np.float32)
        ids, dists, diag = self._fused_scan(
            q,
            dev.centroids,
            dev.binary,
            dev.ex,
            dev.f_add,
            dev.f_rescale,
            dev.f_error,
            dev.f_add_ex,
            dev.f_rescale_ex,
            dev.cluster_of,
            row_allowed,
            dev.ids,
            packed=packed,
            fused_cblk=self._fused_cblk,
            top_k=params.top_k,
            nprobe=params.nprobe,
            rerank=params.resolved_rerank(),
            metric=self.metric,
            ex_bits=self.ex_bits,
            scan_dtype=self.scan_dtype,
            approx_topk=self.approx_topk,
            with_diagnostics=True,
            max_tiles=self._fused_max_tiles(params.nprobe, batch=1),
            probe_k=probe_k_bucket(params.nprobe, self.cluster_count(), self.scan_dtype),
        )
        ids, dists, diag = jax.device_get((ids, dists, diag))
        results = []
        for i, dd in zip(ids[0], dists[0]):
            if i < 0 or not np.isfinite(dd):
                continue
            score = float(dd) if self.metric is Metric.L2 else float(-dd)
            results.append(SearchResult(id=int(i), score=score))
        d = diag[0]
        return results, SearchDiagnostics(
            estimated=int(d[0]),
            skipped_by_lower_bound=int(d[1]),
            extended_evaluations=int(d[2]),
        )

    def _row_filter(self, filter_ids: np.ndarray) -> np.ndarray:
        """Convert an allowed-id set into a per-row bool mask."""
        ids = self._ids
        n = ids.shape[0]
        np_rows = self.device.ids.shape[0]
        allowed_of_id = allowed_id_table(filter_ids, int(ids.max(initial=0)))
        mask = np.zeros(np_rows, bool)
        idx = ids.astype(np.int64)
        safe = idx < allowed_of_id.shape[0]
        mask[:n][safe] = allowed_of_id[idx[safe]]
        return mask[self._device_perm]  # match the device row layout

    # ------------------------------------------------------------------
    # embedding reconstruction (ivf.rs:1247-1307)
    # ------------------------------------------------------------------

    def fetch_embedding(self, vector_id: int) -> np.ndarray | None:
        h = self.host
        rows = np.flatnonzero(h.ids == vector_id)
        if rows.size == 0:
            return None
        row = int(rows[0])
        cluster = int(np.searchsorted(h.cluster_offsets, row, side="right") - 1)
        total_code = h.ex_codes[row].astype(np.float32) + h.binary_bits[row].astype(
            np.float32
        ) * float(1 << self.ex_bits)
        rec = h.centroids[cluster] + h.delta[row] * total_code + h.vl[row]
        return np.asarray(self.rotator.inverse_rotate(jnp.asarray(rec[None, :])))[0]

    # ------------------------------------------------------------------
    # persistence (RBQ1 v3; io/persistence.py)
    # ------------------------------------------------------------------

    def save_to_path(self, path) -> None:
        from ..io import persistence

        persistence.save_ivf(self, path)

    @classmethod
    def load_from_path(cls, path, scan_dtype: str = "bf16") -> "IvfRabitqIndex":
        from ..io import persistence

        return persistence.load_ivf(path, scan_dtype=scan_dtype)
