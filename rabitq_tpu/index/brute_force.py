"""Brute-force RaBitQ index.

API parity with the reference ``BruteForceRabitqIndex``
(lqhl/rabitq-rs ``src/brute_force.rs``): the whole dataset is quantized
against a zero centroid (``brute_force.rs:252-275``) and every query scans
every code — no clustering, no pruning bound.

On TPU this is exactly the IVF scan kernel with a single zero centroid and
nprobe = 1: one dense [N, D] x [D, B] MXU pass plus the survivor re-rank.
One parity quirk: the reference hardcodes ``g_add = 0`` instead of
``||q - 0||^2`` (``brute_force.rs:571``), so its reported L2 "distance" is
``||v - q||^2 - ||q||^2`` — a per-query constant shift that never changes
ranking. We reproduce the same reported scores.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import DimensionMismatch, EmptyIndex, InvalidConfig
from ..types import Metric, RotatorType, SearchResult
from ..ops.quantize import compute_const_scaling_factor
from ..ops.rotation import Rotator, make_rotator
from .layout import assemble_device_layout
from .scan import make_fused_search
from .ivf import _pad_pow2


@dataclass(frozen=True)
class BruteForceSearchParams:
    """(``brute_force.rs:21-30``) plus the TPU re-rank budget."""

    top_k: int
    rerank: int | None = None

    def resolved_rerank(self) -> int:
        if self.rerank is not None:
            return max(self.rerank, self.top_k)
        return max(4 * self.top_k, 400)


@dataclass
class BruteForceHost:
    binary_bits: np.ndarray  # [N, Dpad] uint8
    ex_codes: np.ndarray  # [N, Dpad] uint16
    delta: np.ndarray
    vl: np.ndarray
    f_add: np.ndarray
    f_rescale: np.ndarray
    f_error: np.ndarray
    residual_norm: np.ndarray
    f_add_ex: np.ndarray
    f_rescale_ex: np.ndarray


class BruteForceRabitqIndex:
    def __init__(
        self,
        dim: int,
        padded_dim: int,
        metric: Metric,
        rotator: Rotator,
        ex_bits: int,
        host: BruteForceHost,
        scan_dtype: str = "bf16",
        approx_topk: bool | None = None,
    ):
        self.dim = dim
        self.padded_dim = padded_dim
        self.metric = metric
        self.rotator = rotator
        self.ex_bits = ex_bits
        self.host = host
        self.scan_dtype = scan_dtype
        self.approx_topk = approx_topk if approx_topk is not None else scan_dtype != "f32"
        self._device = None
        self._device_perm = None
        self._rotate_jit = jax.jit(self.rotator.rotate)
        # rotation + scan fused into one device dispatch
        self._fused_scan = make_fused_search(self.rotator.rotate)

    # ------------------------------------------------------------------

    @classmethod
    def train(
        cls,
        data: np.ndarray,
        total_bits: int,
        metric: Metric = Metric.L2,
        rotator_type: RotatorType = RotatorType.FhtKacRotator,
        seed: int = 42,
        use_faster_config: bool = False,
        scan_dtype: str = "bf16",
    ) -> "BruteForceRabitqIndex":
        """(``brute_force.rs:214-285``)"""
        data = np.ascontiguousarray(data, np.float32)
        if data.size == 0:
            raise InvalidConfig("training data must be non-empty")
        if not (1 <= total_bits <= 16):
            raise InvalidConfig("total_bits must be between 1 and 16")
        n, dim = data.shape
        ex_bits = total_bits - 1
        rotator = make_rotator(dim, rotator_type, seed)
        padded_dim = rotator.padded_dim

        t_const = 0.0
        t_rows = None
        if ex_bits > 0:
            if use_faster_config:
                t_const = compute_const_scaling_factor(padded_dim, ex_bits, seed)
            else:
                # reference default: exact per-vector t sweep; the residual
                # against the zero centroid is the rotated row itself
                from .build import exact_t_rows

                t_rows = exact_t_rows(
                    data, None, np.zeros(n, np.int32), None, rotator, ex_bits
                )

        from .build import build_codes

        codes = build_codes(
            data,
            np.zeros((1, padded_dim), np.float32),  # zero centroid
            np.zeros(n, np.int32),
            rotator=rotator,
            ex_bits=ex_bits,
            metric=metric,
            use_t_const=use_faster_config,
            t_const=t_const,
            t_rows=t_rows,
        )
        host = BruteForceHost(
            binary_bits=codes["binary"],
            ex_codes=codes["ex"],
            delta=codes["delta"],
            vl=codes["vl"],
            f_add=codes["f_add"],
            f_rescale=codes["f_rescale"],
            f_error=codes["f_error"],
            residual_norm=codes["residual_norm"],
            f_add_ex=codes["f_add_ex"],
            f_rescale_ex=codes["f_rescale_ex"],
        )
        return cls(dim, padded_dim, metric, rotator, ex_bits, host, scan_dtype)

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return int(self.host.binary_bits.shape[0])

    @property
    def is_empty(self) -> bool:
        return len(self) == 0

    @property
    def device(self):
        if self._device is None:
            h = self.host
            n = len(self)
            # one cluster (the zero centroid), every row in it
            self._device = assemble_device_layout(
                n=n,
                ex_bits=self.ex_bits,
                binary=h.binary_bits,
                ex=h.ex_codes,
                f_add=h.f_add,
                f_rescale=h.f_rescale,
                f_error=h.f_error,
                f_add_ex=h.f_add_ex,
                f_rescale_ex=h.f_rescale_ex,
                cluster_sizes=np.array([n], np.int64),
                ids=np.arange(n, dtype=np.int64),
                centroids=np.zeros((1, self.padded_dim), np.float32),
            )
            self._device_perm = self._device.perm
        return self._device

    # ------------------------------------------------------------------

    def search(
        self, query: np.ndarray, params: BruteForceSearchParams
    ) -> list[SearchResult]:
        return self.batch_search(np.asarray(query, np.float32)[None, :], params)[0]

    def search_filtered(
        self,
        query: np.ndarray,
        params: BruteForceSearchParams,
        filter_ids: np.ndarray,
    ) -> list[SearchResult]:
        return self.batch_search(
            np.asarray(query, np.float32)[None, :], params, filter_ids=filter_ids
        )[0]

    def batch_search(
        self,
        queries: np.ndarray,
        params: BruteForceSearchParams,
        filter_ids: np.ndarray | None = None,
    ) -> list[list[SearchResult]]:
        if self.is_empty:
            raise EmptyIndex()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[1] != self.dim:
            raise DimensionMismatch(self.dim, queries.shape[1])
        b = queries.shape[0]
        if params.top_k <= 0:
            return [[] for _ in range(b)]

        dev = self.device
        packed = None
        if self.scan_dtype in ("fused", "fused8"):
            # brute force scans every row anyway (no cluster pruning to
            # fold), so the fused selection kernel buys nothing here; the
            # dense bf16 path is the equivalent configuration
            self.scan_dtype = "bf16"
        if self.scan_dtype == "packed":
            if getattr(self, "_packed", None) is None:
                from ..ops.pallas_scan import pack_bitplanes

                self._packed = pack_bitplanes(dev.binary, self.padded_dim)
            packed = self._packed
        row_allowed = dev.valid
        if filter_ids is not None:
            filter_ids = np.asarray(filter_ids)
            n = len(self)
            np_rows = dev.binary.shape[0]
            mask = np.zeros(np_rows, bool)
            if filter_ids.dtype == bool:
                mask[: min(n, filter_ids.shape[0])] = filter_ids[:n]
            else:
                ok = filter_ids[(filter_ids >= 0) & (filter_ids < n)]
                mask[ok.astype(np.int64)] = True
            row_allowed = row_allowed & jnp.asarray(mask[self._device_perm])

        b_pad = _pad_pow2(b)
        q = np.zeros((b_pad, self.dim), np.float32)
        q[:b] = queries

        # np query arg: its upload rides the dispatch (one tunnel round trip)
        ids, dists = self._fused_scan(
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
            nprobe=1,
            packed=packed,
            top_k=params.top_k,
            rerank=params.resolved_rerank(),
            metric=self.metric,
            ex_bits=self.ex_bits,
            scan_dtype=self.scan_dtype,
            approx_topk=self.approx_topk,
        )
        ids, dists = jax.device_get((ids, dists))  # one fetch round trip
        ids = ids[:b]
        dists = dists[:b]
        if self.metric is Metric.L2:
            # reference parity: g_add is hardcoded to 0 for the zero
            # centroid (brute_force.rs:571), while the kernel used
            # ||rot(q)||^2 — equal to ||q||^2 (rotation is orthonormal),
            # so the shift comes off the raw query with no device download
            q_norm_sq = np.sum(q[:b] ** 2, axis=-1, keepdims=True)
            dists = dists - q_norm_sq

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

    # ------------------------------------------------------------------

    def save_to_path(self, path) -> None:
        from ..io import persistence_bf

        persistence_bf.save_brute_force(self, path)

    @classmethod
    def load_from_path(cls, path, scan_dtype: str = "bf16") -> "BruteForceRabitqIndex":
        from ..io import persistence_bf

        return persistence_bf.load_brute_force(path, scan_dtype=scan_dtype)
