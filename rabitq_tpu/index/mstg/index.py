"""MSTG (Multi-Scale Tree Graph) index — SPANN-style hierarchical index.

Parity with the reference ``MstgIndex`` (lqhl/rabitq-rs ``src/mstg/``):
hierarchical balanced clustering -> closure multi-assignment -> per-posting
RaBitQ quantization in the *original* space (no rotator,
``mstg/index.rs:49-88``) -> centroid navigation -> dynamic pruning ->
1-bit FastScan scan of selected posting lists (``mstg/index.rs:216-331``).

TPU-first deviations (documented, all quality-neutral or better):

* Centroid navigation is an exact top-ef centroid matmul instead of an
  HNSW graph. For the reference's own scale (hundreds to a few thousand
  centroids at max_posting_size=5000) the matmul is a single tiny MXU op,
  removes the hnsw_rs dependency and the first-query graph-build stall
  (``mstg/hnsw.rs:67-118``), and is exact where HNSW is approximate.
* Posting lists live as one flat row space scanned by the shared fused
  kernel (``index/scan.py``) with the probe mask built from
  ef_search + dynamic pruning; per-row f_error is zeroed exactly like the
  reference's scan (``mstg/index.rs:285-299``).
* Results are deduplicated across posting lists (closure assignment
  replicates vectors; the reference can return the same id twice).
* Optionally (``config.refine_ex``, default on) survivors are re-scored
  with the extended codes — the reference's MSTG scan is 1-bit-only.
"""

from __future__ import annotations

import functools
import os
import struct
import zlib
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ...errors import DimensionMismatch, EmptyIndex, InvalidConfig, InvalidPersistence
from ...types import Metric, SearchResult
from ...ops import packing
from ...ops.quantize import compute_const_scaling_factor
from ..scan import make_fused_search, probe_k_bucket
from ..ivf import _pad_pow2
from .config import MstgConfig, MstgSearchParams, ScalarPrecision
from .clustering import hierarchical_cluster
from .closure import closure_assign
from .metadata import PostingListDirectory

_MAGIC = b"MSTG"
# native single-file format (distinct from the reference's bincode-v1
# multi-file format); v1003 stores centroids in their configured scalar
# precision (bf16 bits / fp16 halves / int8+scale) instead of always f32
_VERSION = 1003


@dataclass
class MstgHost:
    binary_bits: np.ndarray  # [R, dim] uint8 (R = total rows incl. replicas)
    ex_codes: np.ndarray  # [R, dim] uint16
    f_add: np.ndarray
    f_rescale: np.ndarray
    f_add_ex: np.ndarray
    f_rescale_ex: np.ndarray
    delta: np.ndarray
    vl: np.ndarray
    ids: np.ndarray  # [R] int64 original vector id per row
    list_offsets: np.ndarray  # [C+1] row ranges per posting list
    centroids: np.ndarray  # [C, dim] f32
    # MSTG's own scan zeroes f_error (mstg/index.rs:285), but the reference
    # SERIALIZES both per vector (quantizer.rs:82-86) — kept for the
    # reference-format writer (None on legacy loads -> written as zeros)
    f_error: np.ndarray | None = None
    residual_norm: np.ndarray | None = None


class MstgIndex:
    def __init__(
        self,
        config: MstgConfig,
        dim: int,
        host: MstgHost | None,
        scan_dtype: str = "bf16",
        approx_topk: bool | None = None,
        rotator=None,
        *,
        _meta: dict | None = None,
        _codes_dev: dict | None = None,
    ):
        self.config = config
        self.dim = dim  # original (query) dimension
        self.rotator = rotator  # optional FhtKac (config.use_rotator)
        # quantization-space dimension: padded when rotating
        self.quant_dim = rotator.padded_dim if rotator is not None else dim
        # Host codes are LAZY for device-built indexes (``host=None`` +
        # ``_codes_dev``): the big code planes stay device-resident from
        # build_codes_device and materialize host-side only on demand
        # (save/fetch/mode switch) — the build path transfers the dataset
        # exactly once, like IvfRabitqIndex (CLAUDE.md invariant; this cut
        # ~200 s of plane downloads from the 1M MSTG build).
        self._host = host
        if host is not None:
            self._ids = host.ids
            self._offsets = host.list_offsets
            self._centroids_np = host.centroids
            self._small = None
        else:
            assert _meta is not None and _codes_dev is not None
            self._ids = _meta["ids"]
            self._offsets = _meta["list_offsets"]
            self._centroids_np = _meta["centroids"]
            self._small = _meta["small"]  # [R] per-row fields for MstgHost
        self._codes_dev = _codes_dev
        self.scan_dtype = scan_dtype
        self.approx_topk = approx_topk if approx_topk is not None else scan_dtype != "f32"
        # query upload encoding for serving ("f32" | "bf16" | "int8" |
        # "int4") — same contract as IvfRabitqIndex.upload_dtype: fewer
        # bytes over the host link, all math f32 on device after decode
        self.upload_dtype: str = "f32"
        self.build_report: dict | None = None  # build phase report
        self._device = None
        # optional rotation fused into the scan program (one dispatch)
        self._fused_scan = make_fused_search(
            rotator.rotate if rotator is not None else None, dim=self.dim
        )
        # disk-tier scaffolding (mstg/metadata.rs parity); all lists resident
        row_bytes = self.quant_dim * 2 if self._ids.size else 0
        self.directory = PostingListDirectory.from_offsets(self._offsets, row_bytes)

    @property
    def host(self) -> MstgHost:
        """Host code arrays; device-built indexes download them on first
        access (inverse of the device layout's row permutation)."""
        if self._host is None:
            self._host = self._download_host()
        return self._host

    @host.setter
    def host(self, value: MstgHost) -> None:
        self._host = value
        self._ids = value.ids
        self._offsets = value.list_offsets
        self._centroids_np = value.centroids

    def _download_host(self, dev=None) -> MstgHost:
        """Materialize MstgHost from the device layout (the [R] per-row
        scalar fields were kept host-side at build; only the big code
        planes transfer). Mirrors ``IvfRabitqIndex._download_host``."""
        from ..scan import ex_plane_is_total

        dev = dev if dev is not None else self.device
        ex_bits = self.config.rabitq_bits - 1
        n = self.total_rows
        perm = np.asarray(dev.perm)
        pos_of_row = np.empty_like(perm)
        pos_of_row[perm] = np.arange(perm.shape[0])
        take = jnp.asarray(pos_of_row[:n])
        # width-padded refine plane (layout.py): slice the pad columns off
        ex = np.asarray(jnp.take(dev.ex, take, axis=0))[
            :, : self.quant_dim
        ].astype(np.int32)
        if dev.binary is not None:
            binary = np.asarray(jnp.take(dev.binary, take, axis=0)).astype(
                np.uint8
            )
        else:  # fused layout: refine plane holds TOTAL codes
            binary = (ex >> ex_bits).astype(np.uint8)
        if ex_plane_is_total(ex_bits):
            ex = ex - (binary.astype(np.int32) << ex_bits)
        s = self._small
        return MstgHost(
            binary_bits=binary,
            ex_codes=ex.astype(np.uint16),
            f_add=s["f_add"],
            f_rescale=s["f_rescale"],
            f_add_ex=s["f_add_ex"],
            f_rescale_ex=s["f_rescale_ex"],
            delta=s["delta"],
            vl=s["vl"],
            ids=self._ids,
            list_offsets=self._offsets,
            centroids=self._centroids_np,
            f_error=s["f_error"],
            residual_norm=s["residual_norm"],
        )

    # ------------------------------------------------------------------

    @classmethod
    def build(
        cls,
        data: np.ndarray,
        config: MstgConfig | None = None,
        seed: int = 42,
        scan_dtype: str = "bf16",
    ) -> "MstgIndex":
        """(``mstg/index.rs:16-140``)"""
        config = config or MstgConfig()
        data = np.asarray(data)
        if data.dtype != np.float32:
            data = np.ascontiguousarray(data, np.float32)
        if data.size == 0:
            raise InvalidConfig("cannot build index from empty data")
        n, orig_dim = data.shape
        # single upload reused by every stage — reduced-precision over the
        # slow tunnel for large datasets (utils/transfer.py)
        from ...utils.transfer import upload_dataset

        data_dev, upload_report = upload_dataset(data, config.data_upload)
        rotator = None
        if config.use_rotator:
            # TPU extension. Rotation is an isometry, so clustering and
            # closure assignment run on the ORIGINAL data (no extra
            # transfer); only the quantization pipeline rotates rows
            # (in-device, via build_codes' rotate_fn) and the stored
            # centroids are the rotated ones.
            from ...ops.rotation import make_rotator
            from ...types import RotatorType

            rotator = make_rotator(orig_dim, RotatorType.FhtKacRotator, seed)
        dim = rotator.padded_dim if rotator is not None else orig_dim

        from ...utils.logging import get_logger, timed

        _log = get_logger("mstg")

        # Step 1: hierarchical balanced clustering (assignment matmuls in
        # bf16 above ~64M elements, same auto policy as IVF train)
        from ...ops.kmeans import auto_assign_dtype

        with timed(f"hierarchical clustering n={n}", _log):
            clusters = hierarchical_cluster(
                data,
                max_cluster_size=config.max_posting_size,
                branching_factor=config.branching_factor,
                balance_weight=config.balance_weight,
                seed=seed,
                data_dev=data_dev,
                refine_iters=config.refine_iters,
                assign_dtype=auto_assign_dtype(n, orig_dim),
            )
        centroids = clusters.centroids

        # Step 2: closure assignment with the RNG rule
        with timed(f"closure assignment C={len(centroids)}", _log):
            members = closure_assign(
                data, centroids, config.closure_epsilon, config.max_replicas,
                data_dev=data_dev,
            )

        # Real scalar quantization (mstg/scalar_quant.rs:69-86): round the
        # STORED centroids through the configured precision, so the
        # residual base, the centroid scoring operands and the persisted
        # bytes are all the same (exactly representable) values.
        from .scalar_quant import apply_centroid_precision

        if rotator is None:
            centroids = apply_centroid_precision(
                centroids, config.centroid_precision
            )
        else:
            centroids = apply_centroid_precision(
                np.asarray(jax.jit(rotator.rotate)(jnp.asarray(centroids))),
                config.centroid_precision,
            )
        # either way `centroids` now holds the exact stored values — the
        # residual base for BOTH the t sweep and build_codes (rounding does
        # not commute with rotation, so the rotator branch must hand the
        # sweep the rotated-space quantized base, not the raw centroids)

        # Step 3: per-posting-list residual quantization (original space,
        # or rotated space under the use_rotator extension)
        ex_bits = config.rabitq_bits - 1
        t_const = 0.0
        t_rows = None
        if ex_bits > 0 and config.faster_config:
            t_const = compute_const_scaling_factor(dim, ex_bits, seed)

        total_rows = sum(m.size for m in members)
        offsets = np.zeros(len(members) + 1, np.int64)
        np.cumsum([m.size for m in members], out=offsets[1:])
        ids = np.concatenate(members) if members else np.zeros(0, np.int64)
        row_list = np.repeat(
            np.arange(len(members), dtype=np.int32),
            [m.size for m in members],
        )

        from ..build import build_codes_device, exact_t_rows

        if ex_bits > 0 and not config.faster_config:
            # reference default: exact per-vector t sweep (quantizer.rs:332)
            if rotator is None:
                t_rows = exact_t_rows(
                    data, centroids, row_list, ids, rotator, ex_bits
                )
            else:
                t_rows = exact_t_rows(
                    data, None, row_list, ids, rotator, ex_bits,
                    centroids_rotated=centroids,
                )
        with timed(f"quantize rows={total_rows}", _log):
            codes_dev, m = build_codes_device(
                data_dev,
                centroids,
                row_list,
                rotator=rotator,  # None: reference parity (original space)
                ex_bits=ex_bits,
                metric=config.metric,
                use_t_const=config.faster_config,
                t_const=t_const,
                t_rows=t_rows,
                order=ids,  # closure-replicated rows gathered on device
            )
            # only the small [R] per-row fields come down now; the big code
            # planes stay device-resident and feed assemble_device_layout
            # directly (host copies are lazy — save/fetch/mode switch)
            small = {
                k: np.asarray(codes_dev[k])[:m]
                for k in (
                    "f_add", "f_rescale", "f_error", "f_add_ex",
                    "f_rescale_ex", "delta", "vl", "residual_norm",
                )
            }
        meta = {
            "ids": ids,
            "list_offsets": offsets,
            "centroids": centroids,
            "small": small,
        }
        index = cls(
            config, orig_dim, None, scan_dtype, rotator=rotator,
            _meta=meta, _codes_dev=codes_dev,
        )
        index.build_report = {"upload": upload_report}
        return index

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        """Number of distinct indexed vectors."""
        if self._ids.size == 0:
            return 0
        return int(self._ids.max()) + 1

    @property
    def total_rows(self) -> int:
        return int(self._ids.shape[0])

    def posting_list_count(self) -> int:
        return int(self._offsets.shape[0] - 1)

    def replication_factor(self) -> float:
        n = len(self)
        return self.total_rows / max(n, 1)

    def memory_usage(self) -> int:
        """Rough device-resident bytes (mirrors ``mstg/index.rs:143-147``);
        computed from shapes only (never forces the lazy host download)."""
        r = int(self._ids.shape[0])
        code_bytes = 2 * r * self.quant_dim  # binary + ex int8 planes
        factor_bytes = 6 * 4 * r
        cent_bytes = int(
            self._centroids_np.shape[0]
            * self._centroids_np.shape[1]
            * self.config.centroid_precision.bytes_per_dim
        )
        return code_bytes + factor_bytes + cent_bytes

    def _layout_mode(self) -> str:
        from ..scan import is_fused

        return "sorted" if is_fused(self.scan_dtype) else "perm"

    def _maybe_downgrade_fused(self) -> None:
        """Small posting lists (< TN/128 rows on average) exceed the fused
        kernel's 128-cluster tile window; fall back to the dense path."""
        from ..scan import is_fused

        if not is_fused(self.scan_dtype):
            return
        key = id(self._offsets)
        cache = getattr(self, "_fused_ok_cache", None)
        if cache is None or cache[0] != key:
            from ...ops.pallas_fused_scan import (
                fused_fits_vmem,
                fused_geometry_ok,
            )

            plane_w = self.quant_dim + (-self.quant_dim) % 128
            ok = fused_geometry_ok(np.diff(self._offsets)) and fused_fits_vmem(
                plane_w, direct=False, int8_q=self.scan_dtype == "fused8"
            )
            cache = (key, ok)
            self._fused_ok_cache = cache
        if not cache[1]:
            from ...utils.logging import get_logger

            get_logger("mstg").warning(
                "posting-list geometry unsuited for scan_dtype=%r (too "
                "fine, or tile footprint over the VMEM budget at this "
                "dim); falling back to bf16",
                self.scan_dtype,
            )
            self.scan_dtype = "bf16"

    def _fused_max_tiles(self, ef_search, batch: int | None = None) -> int | None:
        """Probed-tile compaction budget (see IvfRabitqIndex._fused_max_tiles);
        ef_search plays nprobe and posting lists play clusters."""
        from ..scan import is_fused

        if not is_fused(self.scan_dtype) or not isinstance(
            ef_search, (int, np.integer)
        ):
            return None
        import os

        compact_env = os.environ.get("RABITQ_FUSED_COMPACT", "1")
        if compact_env == "0":
            return None
        from ...ops.pallas_fused_scan import (
            TB,
            TN,
            expected_tile_cost,
            probed_tile_bound,
        )
        from ..layout import pad_rows

        bt = TB if batch is None else min(TB, ((int(batch) + 31) // 32) * 32)
        key = (id(self._offsets), int(ef_search), bt)
        cache = getattr(self, "_max_tiles_cache", None)
        if cache is None:
            cache = self._max_tiles_cache = {}
        if key not in cache:
            n_tiles = pad_rows(self.total_rows, TN) // TN
            sizes = np.diff(self._offsets)
            exp = expected_tile_cost(sizes, int(ef_search), batch_tile=bt)
            if compact_env == "force":
                # experiment knob: full-length needed-first list even when
                # the gate says dense (skipped steps still cost ~nothing;
                # the gate's distinct-uniform model overestimates sorted
                # blocks' unions — tools/mstg_decompose.py measures this)
                cache[key] = n_tiles
            elif exp >= 0.6 * n_tiles:
                cache[key] = None  # most tiles probed anyway: dense walk
            else:
                bound = probed_tile_bound(sizes, int(ef_search), batch_tile=bt)
                cache[key] = min(1 << (bound - 1).bit_length(), n_tiles)
        return cache[key]

    @property
    def device(self):
        if self._device is not None and getattr(self, "_device_mode", None) != self._layout_mode():
            if self._host is None:
                # capture host codes from the OLD layout before dropping it
                self._host = self._download_host(self._device)
            self._device = None  # re-assemble in the new mode
            self._packed = None
            self._fused_cblk = None
        if self._device is None:
            from ..layout import assemble_device_layout

            kwargs = {}
            if self._layout_mode() == "sorted":
                from ...ops.pallas_fused_scan import TN

                # refinement off -> stage 2 re-scores with the 1-bit
                # estimator, which reads the dense binary plane
                kwargs = {
                    "permute": False,
                    "row_pad": TN,
                    "keep_binary": not self.config.refine_ex,
                }
            if self._host is None and self._codes_dev is not None:
                # device-built: assemble straight from the build outputs
                # (no host round trip; layout.py trims the chunk padding)
                c = self._codes_dev
                src = {
                    "binary": c["binary"], "ex": c["ex"],
                    "f_add": c["f_add"], "f_rescale": c["f_rescale"],
                    "f_add_ex": c["f_add_ex"],
                    "f_rescale_ex": c["f_rescale_ex"],
                }
                self._codes_dev = None  # layout holds the data from here on
            else:
                h = self.host
                src = {
                    "binary": h.binary_bits, "ex": h.ex_codes,
                    "f_add": h.f_add, "f_rescale": h.f_rescale,
                    "f_add_ex": h.f_add_ex, "f_rescale_ex": h.f_rescale_ex,
                }
            self._device = assemble_device_layout(
                n=self.total_rows,
                ex_bits=self.config.rabitq_bits - 1,
                cluster_sizes=np.diff(self._offsets),
                ids=self._ids,
                centroids=self._centroids_np,
                # reference MSTG zeroes f_error in its scan (mstg/index.rs:285)
                zero_f_error=True,
                **src,
                **kwargs,
            )
            self._device_mode = self._layout_mode()
        return self._device

    # ------------------------------------------------------------------

    def search(self, query: np.ndarray, params: MstgSearchParams) -> list[SearchResult]:
        return self.batch_search(np.asarray(query, np.float32)[None, :], params)[0]

    def batch_search(
        self, queries: np.ndarray, params: MstgSearchParams
    ) -> list[list[SearchResult]]:
        """(``mstg/index.rs:150-213``; batched like ``batch_search`` at 340)"""
        if self.total_rows == 0:
            raise EmptyIndex()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, queries.shape[1])
        b = queries.shape[0]
        if params.top_k <= 0:
            return [[] for _ in range(b)]

        self._maybe_downgrade_fused()
        dev = self.device
        packed, fused_cblk = self._scan_planes(dev)
        b_pad = _pad_pow2(b)
        # np query arg: its upload rides the dispatch (one tunnel round trip)
        ids, dists = jax.device_get(
            self._dispatch_scan(
                self._encode_queries(queries, b_pad), params, dev, packed,
                fused_cblk,
            )
        )
        ids = ids[:b]
        dists = dists[:b]

        return self._dedup_results(ids, dists, params.top_k)

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("top_k",))
    def _dedup_topk_device(ids, dists, *, top_k: int):
        """Closure dedup ON DEVICE: results arrive best-first along the
        candidate axis, so in a stable id-sort the first occurrence of an
        id is its best replica. Running this inside the dispatch (instead
        of numpy on the fetched [B, rerank] arrays) shrinks the result
        fetch to [B, top_k] and removes ~12 ms/256-block of host work
        (measured, tools/mstg_profile.py)."""
        b, r = ids.shape
        valid = (ids >= 0) & jnp.isfinite(dists)
        ids_safe = jnp.where(valid, ids, -1)
        order = jnp.argsort(ids_safe, axis=1, stable=True)
        sorted_ids = jnp.take_along_axis(ids_safe, order, axis=1)
        first = jnp.concatenate(
            [jnp.ones((b, 1), bool), sorted_ids[:, 1:] != sorted_ids[:, :-1]],
            axis=1,
        )
        keep = (
            jnp.zeros((b, r), bool)
            .at[jnp.arange(b)[:, None], order]
            .set(first)
            & valid
        )
        # compact kept entries to the front, preserving best-first order
        rank = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32), (b, r))
        comp = jnp.argsort(jnp.where(keep, rank, r + rank), axis=1)
        comp = comp[:, : min(top_k, r)]
        out_ids = jnp.take_along_axis(ids, comp, axis=1)
        out_d = jnp.take_along_axis(dists, comp, axis=1)
        ok = jnp.take_along_axis(keep, comp, axis=1)
        out_ids = jnp.where(ok, out_ids, -1)
        out_d = jnp.where(ok, out_d, jnp.inf)
        if top_k > r:  # tiny indexes: pad out to the requested k
            pad = top_k - r
            out_ids = jnp.pad(out_ids, ((0, 0), (0, pad)), constant_values=-1)
            out_d = jnp.pad(out_d, ((0, 0), (0, pad)), constant_values=jnp.inf)
        # presentation sort: the exact scan's f32 g_add correction can
        # flip kernel-order near-ties, and users expect monotone scores
        # (index/scan.py sort_result_rows — the fast path's twin)
        from ..scan import sort_result_rows

        return sort_result_rows(out_ids, out_d)

    def _gather_budget(self, ef_search) -> int | None:
        """Static per-query gather budget (IVF twin — OPT-IN via
        ``RABITQ_GATHER=1``; see ``IvfRabitqIndex._gather_budget`` for
        the measured negative that keeps it off). MSTG's probed set is
        the ef prefix ∩ ε-pruning, so the ef-largest-lists bound stays
        safe — pruning only shrinks it."""
        import os

        from ..scan import ex_plane_is_total, gather_budget_bucket, is_fused

        if os.environ.get("RABITQ_GATHER", "0") != "1":
            return None
        ex_bits = self.config.rabitq_bits - 1
        if (
            not is_fused(self.scan_dtype)
            or not self.config.refine_ex
            or not ex_plane_is_total(ex_bits)
        ):
            return None
        key = (id(self._offsets), ef_search if isinstance(ef_search, int) else None)
        cache = getattr(self, "_gather_cache", None)
        if cache is None:
            cache = self._gather_cache = {}
        if key not in cache:
            bucket = gather_budget_bucket(np.diff(self._offsets), ef_search)
            limit = int(os.environ.get("RABITQ_GATHER_MAX", "16384"))
            if bucket is None or bucket > limit or 2 * bucket >= self.total_rows:
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

    def _has_replicas(self) -> bool:
        """Whether closure assignment actually replicated any vector.

        The closure rule only replicates boundary points within
        (1+ε)·closest (``mstg/closure.rs``); well-separated data can end
        up with none at all (the 1M bench workload measures replication
        exactly 1.0). Without replicas the per-dispatch device dedup —
        measured 3.6 ms per b=256 block, ~17% of the serving dispatch
        (tools/mstg_decompose.py) — and the replication-sized result
        extraction are pure overhead, so `_dispatch_scan` skips both.
        """
        cur = getattr(self, "_has_repl", None)
        if cur is None or cur[0] != id(self._ids):
            ids = np.asarray(self._ids)
            cur = (id(self._ids), len(np.unique(ids)) != len(ids))
            self._has_repl = cur
        return cur[1]

    def _fused_exact_ok(self) -> bool:
        """IVF twin (``IvfRabitqIndex._fused_exact_ok``): exact in-kernel
        scoring from the TOTAL plane, no stage-2 survivor gather."""
        import os

        from ..scan import ex_plane_is_total, is_fused

        if os.environ.get("RABITQ_FUSED_EXACT", "1") == "0":
            return False
        from ...ops.pallas_fused_scan import fused_fits_vmem

        plane_w = self.quant_dim + (-self.quant_dim) % 128
        return (
            is_fused(self.scan_dtype)
            and self.config.refine_ex
            and ex_plane_is_total(self.config.rabitq_bits - 1)
            and fused_fits_vmem(plane_w, direct=True)
        )

    def _scan_planes(self, dev):
        """(packed, fused_cblk) for the current scan mode, cached."""
        packed = None
        fused_cblk = None
        from ..scan import is_fused

        if self.scan_dtype == "packed" or is_fused(self.scan_dtype):
            if getattr(self, "_packed", None) is None:
                if dev.packed is not None:  # fused layouts pre-pack
                    self._packed = dev.packed
                else:
                    from ...ops.pallas_scan import pack_bitplanes

                    self._packed = pack_bitplanes(dev.binary, self.quant_dim)
            packed = self._packed
        if is_fused(self.scan_dtype):
            if getattr(self, "_fused_cblk", None) is None:
                from ...ops.pallas_fused_scan import tile_cluster_blocks
                from ..layout import cluster_of_rows

                n_pad = int(dev.ids.shape[0])
                cl = cluster_of_rows(np.diff(self._offsets), n_pad)
                valid = np.arange(n_pad) < self.total_rows
                self._fused_cblk = jnp.asarray(tile_cluster_blocks(cl, valid))
            fused_cblk = self._fused_cblk
        return packed, fused_cblk

    def _encode_queries(self, queries: np.ndarray, b_pad: int):
        """(q_padded, qscale | None) in the ``upload_dtype`` encoding —
        mirror of ``IvfRabitqIndex._pad_queries``."""
        q = np.zeros((b_pad, self.dim), np.float32)
        q[: queries.shape[0]] = queries
        if self.upload_dtype == "bf16":
            import ml_dtypes

            return q.astype(ml_dtypes.bfloat16), None
        if self.upload_dtype == "int8":
            scale = np.maximum(np.abs(q).max(axis=1), 1e-30) / 127.0
            q_i8 = np.clip(np.rint(q / scale[:, None]), -127, 127).astype(np.int8)
            return q_i8, scale.astype(np.float32)
        if self.upload_dtype == "int4":
            from ..scan import pack_int4_queries

            return pack_int4_queries(q)
        return q, None

    def _dispatch_scan(
        self,
        q_encoded,
        params,
        dev,
        packed,
        fused_cblk,
        offset=None,
        sub_block=None,
    ):
        """Enqueue the MSTG scan on an encoded query block; returns device
        arrays (callers fetch — lets serving loops pipeline). With
        ``sub_block``, ``q`` is a resident upload superblock and the scan
        covers the window at ``offset``.

        Closure dedup runs ON DEVICE before the fetch: the scan returns the
        full [B, rerank] replica set (rerank can be thousands at 1M scale),
        and fetching it through the tunnel costs ~12 MB/256-block plus
        ~12 ms of host dedup — `_dedup_topk_device` shrinks the fetch to
        [B, top_k] with identical results (tools/mstg_profile.py)."""
        q, qscale = q_encoded
        ex_bits = self.config.rabitq_bits - 1
        gather_rows = self._gather_budget(params.ef_search)
        cl_starts = cl_sizes = None
        if gather_rows is not None:
            cl_starts, cl_sizes = self._cluster_ranges()
        # fetch the full re-ranked survivor set: closure replication means a
        # vector can appear once per assigned posting list, and deduping a
        # short prefix can silently return fewer than top_k results. The
        # budget itself must also cover top_k distinct ids at the observed
        # replication factor. Replica-free indexes skip the whole dance:
        # the scan extracts top_k directly and no dedup dispatch runs.
        dedup = self._has_replicas()
        rerank = max(
            params.resolved_rerank(),
            int(np.ceil(params.top_k * self.replication_factor())) + 16,
        )
        out_k = rerank if dedup else params.top_k
        b = sub_block if sub_block is not None else q.shape[0]
        ids, dists = self._fused_scan(
            q,
            dev.centroids,
            *dev.scan_args(),
            qscale=qscale,
            offset=offset,
            sub_block=sub_block,
            nprobe=jnp.int32(params.ef_search),
            prune_epsilon=jnp.float32(params.pruning_epsilon),
            packed=packed,
            fused_cblk=fused_cblk,
            top_k=out_k,
            rerank=rerank,
            metric=self.config.metric,
            ex_bits=ex_bits,
            scan_dtype=self.scan_dtype,
            use_prune_epsilon=True,
            refine_ex=self.config.refine_ex,
            clamp_l2=True,
            centroid_select_l2=True,
            approx_topk=self.approx_topk,
            max_tiles=(
                None
                if gather_rows is not None
                else self._fused_max_tiles(params.ef_search, batch=b)
            ),
            probe_k=probe_k_bucket(params.ef_search, self.posting_list_count(), self.scan_dtype),
            cl_starts=cl_starts,
            cl_sizes=cl_sizes,
            gather_rows=gather_rows,
            fused_exact=self._fused_exact_ok(),
            # dedup path: keep the kernel's best-first candidate order
            # through dedup (its top_k selection must match the fast
            # path's); _dedup_topk_device applies the presentation sort
            fused_exact_sort=not dedup,
            locality_depth=int(os.environ.get("RABITQ_LOCALITY", "1")),
        )
        if not dedup:
            return ids, dists
        return self._dedup_topk_device(ids, dists, top_k=params.top_k)

    def _dedup_results(
        self, ids: np.ndarray, dists: np.ndarray, top_k: int
    ) -> list[list[SearchResult]]:
        """Vectorized closure dedup: results arrive best-first, so "first
        occurrence per id" == "best replica". A Python loop over the
        [B, rerank] hit matrix was the MSTG batch path's host bottleneck
        (rerank=4000 x 1000 queries ~ 4M interpreter iterations/batch)."""
        valid = (ids >= 0) & np.isfinite(dists)
        ids_safe = np.where(valid, ids, np.int64(-1))
        sort_keys = np.argsort(ids_safe, axis=1, kind="stable")
        sorted_ids = np.take_along_axis(ids_safe, sort_keys, axis=1)
        first = np.ones_like(sorted_ids, bool)
        first[:, 1:] = sorted_ids[:, 1:] != sorted_ids[:, :-1]
        keep = np.zeros_like(valid)
        np.put_along_axis(keep, sort_keys, first, axis=1)
        keep &= valid
        sign = 1.0 if self.config.metric is Metric.L2 else -1.0
        out: list[list[SearchResult]] = []
        for row_ids, row_d, row_keep in zip(ids, dists, keep):
            sel = np.nonzero(row_keep)[0][:top_k]
            out.append(
                [
                    SearchResult(id=int(row_ids[j]), score=sign * float(row_d[j]))
                    for j in sel
                ]
            )
        return out

    def upload_queries(self, queries: np.ndarray):
        """Device-resident query cache (IVF twin:
        ``IvfRabitqIndex.upload_queries``): encode with the current
        ``upload_dtype`` and upload ONCE; rerun ef/ε sweeps over the same
        queries with ``batch_search_resident`` paying zero query bytes
        per configuration."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, queries.shape[1])
        b_total = queries.shape[0]
        ub = _pad_pow2(b_total)
        return (jax.device_put(self._encode_queries(queries, ub)), b_total, ub)

    def batch_search_resident(
        self, qcache, params: MstgSearchParams, batch_size: int = 256
    ) -> list[list[SearchResult]]:
        """``batch_search`` over an ``upload_queries`` handle — all
        dispatches slice the resident superblock at traced offsets."""
        if self.total_rows == 0:
            raise EmptyIndex()
        cur, b_total, ub = qcache
        if params.top_k <= 0:
            return [[] for _ in range(b_total)]
        self._maybe_downgrade_fused()
        dev = self.device
        packed, fused_cblk = self._scan_planes(dev)
        bs = _pad_pow2(min(batch_size, ub))
        pending = [
            self._dispatch_scan(
                cur, params, dev, packed, fused_cblk,
                offset=np.int32(off), sub_block=bs,
            )
            for off in range(0, b_total, bs)
        ]
        fetched = jax.device_get(pending)
        ids = np.concatenate([f[0] for f in fetched])[:b_total]
        dists = np.concatenate([f[1] for f in fetched])[:b_total]
        return self._dedup_results(ids, dists, params.top_k)

    def batch_search_pipelined(
        self,
        queries: np.ndarray,
        params: MstgSearchParams,
        batch_size: int = 256,
        upload_block: int | None = None,
    ) -> list[list[SearchResult]]:
        """``batch_search`` over many fixed-size blocks with upload/compute
        overlap — the MSTG twin of
        ``IvfRabitqIndex.batch_search_arrays_pipelined``: every put and
        dispatch is async (eager issue order — see the IVF twin's
        docstring for the measured ordering comparison), and every block's
        small result is fetched at the end. Results are identical to
        ``batch_search``; all blocks share one compiled program.
        ``upload_block`` decouples put granularity from dispatch
        granularity exactly as on the IVF twin; 1024 is the measured
        serving default since round 4 (BENCHMARKS.md "Superblock
        uploads, revisited" — with ~3.5 ms exact-scan dispatches serving
        is upload-bound and fewer, larger puts win)."""
        if self.total_rows == 0:
            raise EmptyIndex()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, queries.shape[1])
        b_total = queries.shape[0]
        if params.top_k <= 0:
            return [[] for _ in range(b_total)]
        self._maybe_downgrade_fused()
        dev = self.device
        packed, fused_cblk = self._scan_planes(dev)
        bs = _pad_pow2(min(batch_size, _pad_pow2(b_total)))
        pending = []
        if upload_block is not None:
            ub = _pad_pow2(min(max(upload_block, bs), _pad_pow2(b_total)))
            for s in range(0, b_total, ub):
                cur = jax.device_put(self._encode_queries(queries[s : s + ub], ub))
                for off in range(0, min(ub, b_total - s), bs):
                    pending.append(
                        self._dispatch_scan(
                            cur, params, dev, packed, fused_cblk,
                            offset=np.int32(off), sub_block=bs,
                        )
                    )
        else:
            for s in range(0, b_total, bs):
                cur = jax.device_put(self._encode_queries(queries[s : s + bs], bs))
                pending.append(
                    self._dispatch_scan(cur, params, dev, packed, fused_cblk)
                )
        fetched = jax.device_get(pending)
        ids = np.concatenate([f[0] for f in fetched])[:b_total]
        dists = np.concatenate([f[1] for f in fetched])[:b_total]
        return self._dedup_results(ids, dists, params.top_k)

    def batch_search_arrays_pipelined(
        self,
        queries: np.ndarray,
        params: MstgSearchParams,
        batch_size: int = 256,
        upload_block: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """``batch_search_pipelined`` returning raw arrays
        (ids [B, top_k] int32 with -1 padding, internal distances f32)
        instead of ``SearchResult`` lists — the exact IVF-twin contract.
        Dedup already ran on device inside each dispatch, so this skips
        only the host-side object materialization, which DOMINATES
        high-k serving loops (~300k SearchResult objects per 3000-query
        rep at top_k=100 capped the measured MSTG sweep QPS at ~3.5k
        while this path serves the same blocks at IVF rates)."""
        if self.total_rows == 0:
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
        self._maybe_downgrade_fused()
        dev = self.device
        packed, fused_cblk = self._scan_planes(dev)
        bs = _pad_pow2(min(batch_size, _pad_pow2(b_total)))
        pending = []
        if upload_block is not None:
            ub = _pad_pow2(min(max(upload_block, bs), _pad_pow2(b_total)))
            for s in range(0, b_total, ub):
                cur = jax.device_put(self._encode_queries(queries[s : s + ub], ub))
                for off in range(0, min(ub, b_total - s), bs):
                    pending.append(
                        self._dispatch_scan(
                            cur, params, dev, packed, fused_cblk,
                            offset=np.int32(off), sub_block=bs,
                        )
                    )
        else:
            for s in range(0, b_total, bs):
                cur = jax.device_put(self._encode_queries(queries[s : s + bs], bs))
                pending.append(
                    self._dispatch_scan(cur, params, dev, packed, fused_cblk)
                )
        fetched = jax.device_get(pending)
        ids = np.concatenate([f[0] for f in fetched])[:b_total]
        dists = np.concatenate([f[1] for f in fetched])[:b_total]
        return ids, dists

    def search_with_diagnostics(
        self, query: np.ndarray, params: MstgSearchParams
    ) -> tuple[list[SearchResult], "SearchDiagnostics"]:
        """Search plus counters measured inside the scan kernel (fused:
        in-Pallas counters; dense: mask sums). ``estimated + skipped``
        equals the rows actually offered — comparing it against the sum of
        the top-ef posting-list sizes reveals whether ε-pruning binds
        (``mstg/index.rs:349-362``): when it does, fewer lists than ef are
        probed and the offered-row count drops below that sum.
        """
        from ...types import SearchDiagnostics

        self._maybe_downgrade_fused()
        dev = self.device
        packed, fused_cblk = self._scan_planes(dev)
        q = np.zeros((1, self.dim), np.float32)
        q[0] = np.asarray(query, np.float32)
        ex_bits = self.config.rabitq_bits - 1
        ids, dists, diag = self._fused_scan(
            q,
            dev.centroids,
            *dev.scan_args(),
            nprobe=jnp.int32(params.ef_search),
            prune_epsilon=jnp.float32(params.pruning_epsilon),
            packed=packed,
            fused_cblk=fused_cblk,
            top_k=params.top_k,
            rerank=params.resolved_rerank(),
            metric=self.config.metric,
            ex_bits=ex_bits,
            scan_dtype=self.scan_dtype,
            use_prune_epsilon=True,
            refine_ex=self.config.refine_ex,
            clamp_l2=True,
            centroid_select_l2=True,
            approx_topk=self.approx_topk,
            with_diagnostics=True,
            max_tiles=self._fused_max_tiles(params.ef_search, batch=1),
            probe_k=probe_k_bucket(params.ef_search, self.posting_list_count(), self.scan_dtype),
        )
        ids, dists, diag = jax.device_get((ids, dists, diag))
        sign = 1.0 if self.config.metric is Metric.L2 else -1.0
        results = [
            SearchResult(id=int(i), score=sign * float(dd))
            for i, dd in zip(ids[0], dists[0])
            if i >= 0 and np.isfinite(dd)
        ][: params.top_k]
        d = diag[0]
        return results, SearchDiagnostics(
            estimated=int(d[0]),
            skipped_by_lower_bound=int(d[1]),
            extended_evaluations=int(d[2]),
        )

    # ------------------------------------------------------------------
    # persistence (single-file TPU format; the reference's multi-file
    # bincode + hnsw_rs graph dumps are Rust-runtime-specific)
    # ------------------------------------------------------------------

    def save_to_path(self, path, format: str = "native") -> None:
        """Persist the index. ``format="native"`` writes the single-file
        v1003 format; ``format="reference"`` writes the reference's
        bincode v1 ``.mstg`` body (``mstg/io.rs:82-126``) readable by the
        reference's ``load_main_index`` — see
        :func:`ref_io.save_reference_mstg` for the hnsw side-file caveat.
        """
        if format == "reference":
            from .ref_io import save_reference_mstg

            save_reference_mstg(self, path)
            return
        if format != "native":
            raise InvalidConfig(f"unknown MSTG save format {format!r}")
        h = self.host
        cfg = self.config
        n_lists = self.posting_list_count()
        r = self.total_rows
        dim = self.dim
        quant_dim = self.quant_dim
        ex_bits = cfg.rabitq_bits - 1

        with open(path, "wb") as f:
            crc = 0

            def w(data: bytes, hashed: bool = True):
                nonlocal crc
                f.write(data)
                if hashed:
                    crc = zlib.crc32(data, crc)

            w(_MAGIC, hashed=False)
            w(struct.pack("<I", _VERSION), hashed=False)
            prec_tag = list(ScalarPrecision).index(cfg.centroid_precision)
            w(
                struct.pack(
                    "<IBBBBffIIfIB",
                    dim,
                    cfg.metric.to_tag(),
                    cfg.rabitq_bits,
                    prec_tag,
                    1 if cfg.refine_ex else 0,
                    cfg.closure_epsilon,
                    cfg.balance_weight,
                    cfg.max_posting_size,
                    cfg.branching_factor,
                    cfg.pruning_epsilon,
                    cfg.default_ef_search,
                    1 if cfg.faster_config else 0,
                )
            )
            w(struct.pack("<I", quant_dim))
            rot_blob = self.rotator.serialize() if self.rotator is not None else b""
            w(struct.pack("<Q", len(rot_blob)))
            w(rot_blob)
            w(struct.pack("<QQ", n_lists, r))
            # centroid block in the configured precision; build already
            # rounded h.centroids through it, so quantization here is
            # lossless and save/load round-trips byte-exactly
            from .scalar_quant import quantize_centroids

            stored, _ = quantize_centroids(h.centroids, cfg.centroid_precision)
            if cfg.centroid_precision is ScalarPrecision.INT8:
                w(stored["scale"].astype("<f4").tobytes())
                w(stored["data"].astype("<i1").tobytes())
            elif cfg.centroid_precision is ScalarPrecision.BF16:
                w(stored["data"].astype("<u2").tobytes())
            elif cfg.centroid_precision is ScalarPrecision.FP16:
                w(stored["data"].astype("<f2").tobytes())
            else:
                w(stored["data"].astype("<f4").tobytes())
            w(h.list_offsets.astype("<u8").tobytes())
            w(h.ids.astype("<u8").tobytes())
            w(packing.pack_binary(h.binary_bits).tobytes())
            if ex_bits > 0:
                w(packing.pack_ex_generic(h.ex_codes, ex_bits).tobytes())
            for name in ("f_add", "f_rescale", "f_add_ex", "f_rescale_ex", "delta", "vl"):
                w(getattr(h, name).astype("<f4").tobytes())
            # v1003: f_error + residual_norm round-trip (the scan zeroes
            # f_error, but the reference-format writer needs the real ones)
            for name in ("f_error", "residual_norm"):
                v = getattr(h, name)
                v = np.zeros(r, np.float32) if v is None else v
                w(v.astype("<f4").tobytes())
            w(struct.pack("<I", crc), hashed=False)

    @classmethod
    def load_from_path(cls, path, scan_dtype: str = "bf16") -> "MstgIndex":
        from ...io.persistence import _Cursor

        with open(path, "rb") as f:
            data = f.read()
        cur = _Cursor(data)
        if cur.take(4) != _MAGIC:
            raise InvalidPersistence("unrecognized file header")
        version = cur.u32()
        if version == 1:
            # the reference's bincode multi-file format (mstg/io.rs:14-245)
            from .ref_io import load_reference_mstg

            return load_reference_mstg(path, scan_dtype=scan_dtype)
        if version not in (1001, 1002, _VERSION):
            raise InvalidPersistence(
                f"unsupported MSTG format version {version} (supported: the "
                "native v1001/v1002/v1003 single-file formats and the "
                "reference's bincode v1 multi-file format)"
            )
        stored_crc = struct.unpack("<I", data[-4:])[0]
        if zlib.crc32(data[8:-4]) != stored_crc:
            raise InvalidPersistence("checksum mismatch")

        (
            dim,
            metric_tag,
            rabitq_bits,
            prec_tag,
            refine_ex,
            closure_eps,
            balance_w,
            max_posting,
            branching,
            pruning_eps,
            default_ef,
            faster,
        ) = struct.unpack("<IBBBBffIIfIB", cur.take(struct.calcsize("<IBBBBffIIfIB")))
        if version >= 1002:
            quant_dim = cur.u32()
            rot_len = cur.u64()
            rot_blob = cur.take(rot_len)
        else:  # v1001 predates the rotator extension
            quant_dim, rot_len, rot_blob = dim, 0, b""
        n_lists = cur.u64()
        r = cur.u64()
        cfg = MstgConfig(
            max_posting_size=max_posting,
            branching_factor=branching,
            balance_weight=balance_w,
            closure_epsilon=closure_eps,
            rabitq_bits=rabitq_bits,
            faster_config=bool(faster),
            metric=Metric.from_tag(metric_tag),
            centroid_precision=list(ScalarPrecision)[prec_tag],
            default_ef_search=default_ef,
            pruning_epsilon=pruning_eps,
            refine_ex=bool(refine_ex),
            use_rotator=rot_len > 0,
        )
        rotator = None
        if rot_len > 0:
            from ...ops.rotation import FhtKacRotator

            rotator = FhtKacRotator.deserialize(dim, quant_dim, rot_blob)
        ex_bits = rabitq_bits - 1
        prec = cfg.centroid_precision
        if version >= 1003 and prec is not ScalarPrecision.FP32:
            from .scalar_quant import dequantize_centroids

            stored = {}
            if prec is ScalarPrecision.INT8:
                stored["scale"] = cur.f32s(n_lists)
                stored["data"] = (
                    cur.bytes_np(n_lists * quant_dim)
                    .view(np.int8)
                    .reshape(n_lists, quant_dim)
                )
            else:  # BF16 bits / FP16 halves: 2 bytes per dim
                raw = cur.bytes_np(2 * n_lists * quant_dim)
                dt = "<u2" if prec is ScalarPrecision.BF16 else "<f2"
                stored["data"] = (
                    np.frombuffer(raw.tobytes(), dt).reshape(n_lists, quant_dim)
                )
            centroids = dequantize_centroids(stored, prec)
        else:
            centroids = cur.f32s(n_lists * quant_dim).reshape(n_lists, quant_dim)
        offsets = cur.u64s(n_lists + 1).astype(np.int64)
        ids = cur.u64s(r).astype(np.int64)
        bin_len = (quant_dim + 7) // 8
        binary = packing.unpack_binary(
            cur.bytes_np(r * bin_len).reshape(r, bin_len), quant_dim
        ).astype(np.uint8)
        if ex_bits > 0:
            ex_len = (quant_dim * ex_bits + 7) // 8
            ex = packing.unpack_ex_generic(
                cur.bytes_np(r * ex_len).reshape(r, ex_len), quant_dim, ex_bits
            ).astype(np.uint16)
        else:
            ex = np.zeros((r, quant_dim), np.uint16)
        fields = {}
        for name in ("f_add", "f_rescale", "f_add_ex", "f_rescale_ex", "delta", "vl"):
            fields[name] = cur.f32s(r)
        if version >= 1003:
            for name in ("f_error", "residual_norm"):
                fields[name] = cur.f32s(r)
        host = MstgHost(
            binary_bits=binary,
            ex_codes=ex,
            ids=ids,
            list_offsets=offsets,
            centroids=centroids.astype(np.float32),
            **fields,
        )
        return cls(cfg, dim, host, scan_dtype, rotator=rotator)
