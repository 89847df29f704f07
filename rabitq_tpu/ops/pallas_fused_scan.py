"""Pallas TPU kernel: fully fused stage-1 scan + survivor selection.

The dense XLA scan path materializes several ``[B, N]`` tensors in HBM per
query batch (the binary-dot accumulator, the gathered per-row g-terms, the
masked lower bounds, and the bf16 buffer feeding ``approx_max_k``) — at
GIST scale (B=2048, N=1M) that is tens of GB of HBM traffic per batch and
is the scan's dominant cost. This kernel keeps the entire stage-1 pipeline
in VMEM:

* binary codes stream PACKED at 1 bit/dim (``pack_bitplanes``) and unpack
  in VMEM — 8x less code traffic than the dense int8 plane;
* the <binary, q> dot runs on the MXU per (query-tile, row-tile) step;
* the per-(query, cluster) g-terms are expanded to rows *in-kernel*: rows
  are CLUSTER-SORTED (no device permutation on this path), so each row
  tile touches a <=128-wide window of clusters; the window's block index
  is a prefetched scalar (``c_blk``) and the expansion is a one-hot
  [W, TN] matmul built from an iota-compare — no [B, N] gather exists;
* probe/filter masking is folded into the VALUES (non-probed clusters and
  masked rows carry ``BIG``), so pruning needs no separate mask plane;
* survivor selection happens in-kernel: lower bounds reduce into a
  per-query bin accumulator ``bins[b, n mod L]`` held in VMEM across the
  row-tile loop (the moral equivalent of ``approx_max_k``'s stripe-min,
  but fused — the [B, N] lower-bound plane never exists). Cluster-sorted
  rows make consecutive candidates land in DISTINCT bins (n mod L is
  injective on runs shorter than L), so per-element selection recall at
  L >= 10*rerank is ~1 and the exact stage-2 re-rank absorbs the rest.

This replaces the reference's per-cluster FastScan loop + live top-k heap
(lqhl/rabitq-rs ``simd.rs:972-1186``, ``ivf.rs:2045-2057``) with a
single-pass streaming selection sized for the MXU/VPU.

Precision in EXACT mode (``direct_plane``/``with_values``): the bin
minima are the FINAL distances. The q operand is bf16 (2^-9 relative
rounding on the dot) and g_add also enters as bf16 — the larger rounding
term for L2. The caller (``index/scan.py`` fused_exact) adds the f32
g_add correction back onto the returned values, so user-visible
distances carry stage-2 precision; the RANKING stays the kernel's bf16
order (so extraction width never changes results at tie boundaries),
meaning returned distances may be non-monotonic by < g * 2^-9.

Tile geometry (v5e, ~16 MB VMEM budget; defaults hardware-validated in
BENCHMARKS.md "fused bin geometry"):
  TB=128 queries x TN=512 rows per step, W=256 cluster window,
  GROUPS=16 -> L=8192 bins: bins (f32+i32) 8 MB, code tile 64 KB,
  unpacked bits 1 MB, g windows 128 KB — comfortably inside VMEM.
  (L=4096 loses ~0.4 recall points at nprobe=16 to survivor collisions.)
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_scan import pack_bitplanes, packed_bytes, permute_query

TN = 512  # rows per tile (device layouts for this path pad rows to TN)
# Queries per tile x bin groups: bins VMEM = TB * GROUPS * TN * 8 bytes.
# More bins (L = GROUPS * TN) means fewer survivor collisions when many
# rows are probed; fewer queries per tile means more passes over the code
# plane. (128, 16) -> L=8192, 8 MB bins: selection loss is negligible up
# to ~30K probed rows per query. Env-tunable for experiments.
TB = int(os.environ.get("RABITQ_FUSED_TB", "128"))
GROUPS = int(os.environ.get("RABITQ_FUSED_GROUPS", "16"))
W = 256  # cluster window width (two 128-lane blocks)
BIG = 1.0e30  # masked-value sentinel (finite: inf would poison bf16 math)


# Per-core VMEM budget the tile geometry must fit (v5e ~16 MB/core).
VMEM_BUDGET_BYTES = 16 * 2**20


def vmem_step_bytes(
    dpad: int, direct: bool, int8_q: bool = False, tb: int | None = None
) -> int:
    """Conservative per-grid-step VMEM footprint estimate for the bin
    kernel at query-plane width ``dpad``: double-buffered input blocks +
    resident bin outputs + in-kernel temporaries (unpacked bits, the dot
    accumulator, the one-hot window). ``direct`` is the EXACT-scan mode
    (dense int8 total plane, bf16 q); otherwise packed bit planes with
    bf16 (or ``int8_q``) queries. Deliberately errs high — Mosaic reuses
    temporary buffers — so the guard only ever falls back to a correct
    slower path, never admits an over-budget geometry."""
    tb = TB if tb is None else tb
    db = (((dpad + 7) // 8) + 127) // 128 * 128  # packed bytes, 128-lane pad
    d8 = dpad if direct else 8 * db
    code_w = dpad if direct else db
    l_bins = GROUPS * TN
    q_bytes = tb * d8 * (1 if int8_q else 2)
    inputs = 2 * (  # double-buffered block DMAs
        q_bytes + tb * 4 + TN * code_w + 4 * TN * 4 + tb * 4 + 4 * tb * 128 * 2
    )
    outs = 2 * tb * l_bins * 4 + tb * 128 * 4  # resident across row tiles
    bits = TN * d8 * (1 if int8_q else 2)
    temps = bits + tb * TN * 4 + W * TN * 5 + 2 * tb * W * 2 + tb * TN * 4
    return inputs + outs + temps


def fused_fits_vmem(dpad: int, direct: bool = False, int8_q: bool = False) -> bool:
    """Whether the kernel's tile geometry fits the VMEM budget at this
    plane width. At the defaults the EXACT (direct-plane) mode fits
    through Dpad=2048 and falls back to the two-stage packed scan above
    that (which fits through Dpad=3072 with bf16 queries and Dpad=4096
    with int8 ones; past that engines downgrade to the dense XLA path) —
    the budget gate behind ``_fused_exact_ok``/``_maybe_downgrade_fused``
    on every engine (tests/test_highdim.py pins the thresholds)."""
    return vmem_step_bytes(dpad, direct, int8_q) <= VMEM_BUDGET_BYTES


def n_bins() -> int:
    return GROUPS * TN


def tile_cluster_blocks(cluster_of: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Per-row-tile 128-aligned cluster-window block index ``c_blk``.

    Returns [N_tiles] int32 such that every valid row n in tile i has
    ``0 <= cluster_of[n] - 128 * c_blk[i] < W``. Raises ``ValueError`` if
    any tile spans more than 128 clusters (degenerate: average cluster
    smaller than TN/128 rows — callers fall back to the dense path).
    """
    n_pad = len(cluster_of)
    assert n_pad % TN == 0, n_pad
    cl = np.asarray(cluster_of, np.int64).reshape(-1, TN)
    ok = np.asarray(valid, bool).reshape(-1, TN)
    any_valid = ok.any(axis=1)
    lo = np.where(any_valid, np.min(np.where(ok, cl, np.iinfo(np.int64).max), axis=1), 0)
    hi = np.where(any_valid, np.max(np.where(ok, cl, -1), axis=1), 0)
    span = hi - lo
    if span.max(initial=0) > 128:
        raise ValueError(
            f"row tile spans {int(span.max())} clusters (> 128); "
            "fused scan needs cluster-sorted rows with clusters >= "
            f"{TN // 128} rows on average"
        )
    c_pad = _pad_clusters(int(cl.max(initial=0)) + 1)
    c_blk = np.minimum(lo // 128, c_pad // 128 - W // 128)
    return np.maximum(c_blk, 0).astype(np.int32)


def _pad_clusters(c: int) -> int:
    """G-plane cluster padding: at least one full window, 128-aligned."""
    return max(W, ((c + 127) // 128) * 128)


def fused_geometry_ok(cluster_sizes, row_pad: int = TN) -> bool:
    """Whether cluster-sorted rows with these per-cluster sizes fit the
    kernel's <=128-cluster tile windows (i.e. :func:`tile_cluster_blocks`
    would not raise). Callers use this to fall back to the dense path for
    degenerate geometries (average cluster < TN/128 rows)."""
    sizes = np.asarray(cluster_sizes, np.int64)
    n = int(sizes.sum())
    n_pad = max(row_pad, ((n + row_pad - 1) // row_pad) * row_pad)
    cl = np.zeros(n_pad, np.int32)
    cl[:n] = np.repeat(np.arange(len(sizes), dtype=np.int32), sizes)
    try:
        tile_cluster_blocks(cl, np.arange(n_pad) < n)
        return True
    except ValueError:
        return False


def probed_tile_bound(
    cluster_sizes, nprobe: int, batch_tile: int | None = None
) -> int:
    """Safe upper bound on how many TN-row tiles one query block can touch.

    A block of ``batch_tile`` queries probing ``nprobe`` clusters each
    touches at most ``batch_tile * nprobe`` distinct clusters; each cluster
    c spans a known number of row tiles. The bound is the sum of the
    largest ``batch_tile * nprobe`` per-cluster tile spans, capped at the
    total tile count — callers size the compacted tile list with it so no
    probed tile is ever dropped (ε-pruning and filters only shrink the
    probed set).
    """
    if batch_tile is None:
        batch_tile = TB
    sizes = np.asarray(cluster_sizes, np.int64)
    n = int(sizes.sum())
    n_pad = max(TN, ((n + TN - 1) // TN) * TN)
    n_tiles = n_pad // TN
    off = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=off[1:])
    spans = np.zeros(len(sizes), np.int64)
    nonempty = sizes > 0
    spans[nonempty] = (off[1:][nonempty] - 1) // TN - off[:-1][nonempty] // TN + 1
    spans = np.sort(spans)[::-1]
    u = min(len(sizes), batch_tile * max(int(nprobe), 1))
    # exact tightness: fused_select's needed-test ignores masked rows
    # (padding/filtered, fa_eff = BIG), so only real probed rows count
    return int(min(n_tiles, spans[:u].sum()))


def expected_tile_cost(
    cluster_sizes, nprobe: int, batch_tile: int | None = None
) -> float:
    """EXPECTED per-block probed-tile count (vs the worst-case
    :func:`probed_tile_bound`): u uniformly-probed clusters touch about
    ``u * mean_span`` tiles. Used only to GATE compaction — sizing always
    uses the safe bound (capped at the tile count, where padding slots are
    skip-cheap), so an optimistic estimate can cost performance, never
    recall."""
    if batch_tile is None:
        batch_tile = TB
    sizes = np.asarray(cluster_sizes, np.int64)
    n = int(sizes.sum())
    if n == 0 or not len(sizes):
        return 0.0
    n_tiles = max(TN, ((n + TN - 1) // TN) * TN) // TN
    off = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=off[1:])
    nonempty = sizes > 0
    spans = np.zeros(len(sizes), np.float64)
    spans[nonempty] = (off[1:][nonempty] - 1) // TN - off[:-1][nonempty] // TN + 1
    u = min(len(sizes), batch_tile * max(int(nprobe), 1))
    return float(min(n_tiles, u * spans[nonempty].mean()))


def sliced_max_tiles(
    cluster_sizes, nprobe: int, slices, batch_tile: int | None = None
) -> int | None:
    """Compaction budget valid for EVERY row slice in ``slices``.

    The sharded and streamed tiers run the fused kernel on TN-aligned row
    slices ``(start, stop)`` of the cluster-sorted row space (one per
    shard / chunk). A whole-index :func:`probed_tile_bound` routinely
    exceeds a slice's own tile count, which used to disable compaction
    there outright; this computes the max over slices of the LOCAL bound
    (a cluster contributes only its in-slice tile span), applies the
    expected-cost gate per slice, and returns one pow2-bucketed budget
    shared by every slice's compiled program. None = dense walk.
    """
    if batch_tile is None:
        batch_tile = TB
    sizes = np.asarray(cluster_sizes, np.int64)
    off = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=off[1:])
    c_nonempty = max(int((sizes > 0).sum()), 1)
    u = min(c_nonempty, batch_tile * max(int(nprobe), 1))
    best = 0
    max_slab_tiles = 0
    for s, e in slices:
        local = np.maximum(np.minimum(off[1:], e) - np.maximum(off[:-1], s), 0)
        nonempty = local > 0
        m = int(nonempty.sum())
        if m == 0:
            continue  # all-padding slice: never scanned for real rows
        slab_tiles = (int(e) - int(s) + TN - 1) // TN
        max_slab_tiles = max(max_slab_tiles, slab_tiles)
        loc_off = np.zeros(len(local) + 1, np.int64)
        np.cumsum(local, out=loc_off[1:])
        spans = np.zeros(len(local), np.int64)
        spans[nonempty] = (
            (loc_off[1:][nonempty] - 1) // TN - loc_off[:-1][nonempty] // TN + 1
        )
        # EXPECTED cost: of the block's ~u probed clusters, only the
        # slice's share (m / c_nonempty) intersects this slice — the
        # whole-index expected_tile_cost would overcount by the shard
        # count and wrongly reject compaction on every slice
        exp = u * (m / c_nonempty) * float(spans[nonempty].mean())
        if exp >= 0.6 * slab_tiles:
            return None  # one static budget for all slices: all-or-nothing
        # SAFE bound: adversarially, every probed cluster may live in
        # this one slice — sum of its largest u local spans
        top = np.sort(spans[nonempty])[::-1][: min(m, u)]
        best = max(best, int(min(slab_tiles, top.sum())))
    if best <= 0:
        return None
    return int(min(1 << (best - 1).bit_length(), max_slab_tiles))


def _tile_update(
    t,  # traced int32: ACTUAL row-tile index (grid step under compaction)
    c_base,  # traced int32: the tile's cluster-window 128-block base
    q_ref,  # [tb, D8] bf16 (or int8-quantized) bit-plane-permuted queries;
    #         in DIRECT mode [tb, D] natural-order queries
    qs_ref,  # [tb, 1] f32 per-query dequant scale (ones for bf16 queries)
    packed_ref,  # [TN, Db] uint8 bit planes; DIRECT mode: [TN, D] int8 codes
    fa_ref,  # [1, TN] f32 f_add (+BIG on masked rows)
    fr_ref,  # [1, TN] f32 f_rescale
    fe_ref,  # [1, TN] f32 f_error
    cl_ref,  # [1, TN] int32 cluster ids
    k1x_ref,  # [tb, 1] f32 c1 * sum(q)
    g1a_ref,  # [tb, 128] bf16 window halves of (g_add | BIG if unprobed):
    g1b_ref,  #   block-unit index maps quantize starts to the block width,
    g2a_ref,  #   so the 128-aligned W=256 window loads as two 128 blocks
    g2b_ref,  # [tb, 128] bf16 window halves of g_error
    val_ref,  # out [tb, L] f32 bin minima
    idx_ref,  # out [tb, L] int32 bin argmin rows
    cnt_ref,  # out [tb, 128] int32 offered-row counters (diagnostics)
):
    # --- <codes, q> on the MXU ---
    # DIRECT mode (exact scan): the ref holds dense int8 codes (e.g. the
    # TOTAL plane) in natural dim order — dot them as-is, no unpack. The
    # mode is inferred from the shapes: packed bit planes satisfy
    # q_dim == 8 * code_dim, direct planes q_dim == code_dim.
    int8_q = q_ref.dtype == jnp.int8  # static: selects the MXU operand mode
    direct = q_ref.shape[1] == packed_ref.shape[1]
    if direct:
        bits = packed_ref[:].astype(jnp.int8 if int8_q else jnp.bfloat16)
    else:
        x = packed_ref[:].astype(jnp.int32)  # [TN, Db]
        bit_dt = jnp.int8 if int8_q else jnp.bfloat16
        bits = jnp.concatenate(
            [((x >> k) & 1) for k in range(8)], axis=-1
        ).astype(bit_dt)  # [TN, 8*Db] in bit-plane order (permute_query)
    acc = jax.lax.dot_general(
        q_ref[:],
        bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        # int8 x int8 -> int32 runs the MXU at 2x bf16 throughput
        preferred_element_type=jnp.int32 if int8_q else jnp.float32,
    )  # [tb, TN]
    if int8_q:
        acc = acc.astype(jnp.float32) * qs_ref[:, 0][:, None]

    # --- g-term expansion: one-hot window matmul (no [B, N] gather) ---
    loc = cl_ref[0, :] - c_base * 128  # [TN] in [0, W) for valid rows
    slot = jax.lax.broadcasted_iota(jnp.int32, (W, TN), 0)
    onehot = slot == loc[None, :]
    sel1 = onehot.astype(jnp.bfloat16)
    sel2 = jnp.where(onehot, -fe_ref[0, :][None, :], 0.0).astype(jnp.bfloat16)
    g1 = jnp.concatenate([g1a_ref[:], g1b_ref[:]], axis=1)  # [tb, W]
    g2 = jnp.concatenate([g2a_ref[:], g2b_ref[:]], axis=1)
    gterm = jax.lax.dot_general(
        g1, sel1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        g2, sel2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tb, TN] = g_add(row) - f_error * g_error(row), BIG where unprobed

    lb = (
        fa_ref[0, :][None, :]
        + fr_ref[0, :][None, :] * (acc + k1x_ref[:, 0][:, None])
        + gterm
    )

    # --- measured diagnostics: rows actually offered to the bins ---
    # (probed cluster AND unmasked: anything else carries the BIG
    # sentinel; real lower bounds are distance-sized, nowhere near BIG/2)
    tb = lb.shape[0]
    offered = (lb < BIG / 2).astype(jnp.int32).reshape(tb, TN // 128, 128)
    cnt_ref[:] = cnt_ref[:] + jnp.sum(offered, axis=1)

    # --- streaming bin-min update: bin(n) = n mod L, rows n = t*TN + u ---
    new_idx = t * TN + jax.lax.broadcasted_iota(jnp.int32, (tb, TN), 1)
    off = pl.multiple_of(jax.lax.rem(t, GROUPS) * TN, TN)
    cur = val_ref[:, pl.ds(off, TN)]
    better = lb < cur
    val_ref[:, pl.ds(off, TN)] = jnp.where(better, lb, cur)
    cur_i = idx_ref[:, pl.ds(off, TN)]
    idx_ref[:, pl.ds(off, TN)] = jnp.where(better, new_idx, cur_i)


def _kernel(c_blk_ref, *refs):
    """Dense grid: step i scans row tile i (every tile visited)."""
    i = pl.program_id(1)
    val_ref, idx_ref, cnt_ref = refs[-3], refs[-2], refs[-1]

    @pl.when(i == 0)
    def _():
        val_ref[:] = jnp.full_like(val_ref, BIG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    _tile_update(i, c_blk_ref[i], *refs)


def _kernel_compact(tiles_ref, tcount_ref, c_blk_ref, *refs):
    """Compacted grid: step s of query block j scans ACTUAL row tile
    ``tiles_ref[j, s]``. Padding slots repeat the last valid tile (their
    block index maps resolve identically, so Pallas skips the re-DMA) and
    are skipped by the ``s < tcount`` guard — stage-1 work scales with the
    block's probed tiles, not N (the fused analogue of the reference only
    touching probed clusters, ``ivf.rs:1847-1872``)."""
    j = pl.program_id(0)
    s = pl.program_id(1)
    val_ref, idx_ref, cnt_ref = refs[-3], refs[-2], refs[-1]

    @pl.when(s == 0)
    def _():
        val_ref[:] = jnp.full_like(val_ref, BIG)
        idx_ref[:] = jnp.full_like(idx_ref, -1)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    t = tiles_ref[j, s]

    @pl.when(s < tcount_ref[j])
    def _():
        _tile_update(t, c_blk_ref[t], *refs)


def fused_bin_scan(
    packed: jax.Array,  # [Np, Db] uint8, Np % TN == 0, Db % 128 == 0
    q_perm: jax.Array,  # [Bp, 8*Db] bf16 or int8 (permute_query / quantized)
    fa_eff: jax.Array,  # [Np] f32 f_add with +BIG folded onto masked rows
    f_rescale: jax.Array,  # [Np] f32
    f_error: jax.Array,  # [Np] f32
    cluster_of: jax.Array,  # [Np] int32
    k1x: jax.Array,  # [Bp] f32
    g1: jax.Array,  # [Bp, C_pad] bf16: g_add, BIG where cluster unprobed
    g2: jax.Array,  # [Bp, C_pad] bf16: g_error
    c_blk: jax.Array,  # [N_tiles] int32 (tile_cluster_blocks)
    q_scale: jax.Array | None = None,  # [Bp] f32 dequant scale (int8 q_perm)
    tiles: jax.Array | None = None,  # [Bp//tb, T] int32 compacted tile lists
    tcount: jax.Array | None = None,  # [Bp//tb] int32 valid entries per list
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (bins_val [Bp, L] f32, bins_idx [Bp, L] int32,
    offered [Bp, 128] int32):
    ``bins_val[b, l] = min over rows n == l (mod L) of lb[b, n]`` with
    argmin rows in ``bins_idx`` (-1 where no row beat the BIG sentinel);
    ``offered.sum(1)`` counts the rows whose lower bound was actually
    estimated (probed cluster, unmasked) — measured in-kernel for
    SearchDiagnostics, not synthesized.

    With ``tiles``/``tcount`` (see :func:`fused_select`) each query block
    only visits its listed row tiles; unlisted tiles may only contain
    unprobed/masked rows (value BIG), so the bin minima are unchanged.
    """
    n, db = packed.shape
    bq, d8 = q_perm.shape
    assert n % TN == 0 and db % 128 == 0 and d8 in (8 * db, db), (n, db, d8)
    assert g1.shape[1] % 128 == 0 and g1.shape[1] >= W
    tb = min(TB, bq)
    assert bq % tb == 0, (bq, tb)
    n_tiles = n // TN
    l_bins = n_bins()
    compact = tiles is not None
    if compact:
        assert tiles.shape[0] == bq // tb and tcount is not None
        grid = (bq // tb, tiles.shape[1])
        n_prefetch = 3
        # index maps see (j, s, tiles, tcount, c_blk); the actual row tile
        # is tiles[j, s] and its cluster window is c_blk[tiles[j, s]]
        row2 = lambda j, s, t, tc, c: (t[j, s], 0)
        row1 = lambda j, s, t, tc, c: (0, t[j, s])
        qrow = lambda j, s, t, tc, c: (j, 0)
        qcol = lambda j, s, t, tc, c: (0, j)
        g_lo = lambda j, s, t, tc, c: (j, c[t[j, s]])
        g_hi = lambda j, s, t, tc, c: (j, c[t[j, s]] + 1)
        out = lambda j, s, t, tc, c: (j, 0)
        kernel = _kernel_compact
        prefetch_args = (tiles.astype(jnp.int32), tcount.astype(jnp.int32), c_blk)
        work_tiles = tiles.shape[1]
    else:
        grid = (bq // tb, n_tiles)  # row tiles innermost: bins stay resident
        n_prefetch = 1
        row2 = lambda j, i, c: (i, 0)
        row1 = lambda j, i, c: (0, i)
        qrow = lambda j, i, c: (j, 0)
        qcol = lambda j, i, c: (0, j)
        g_lo = lambda j, i, c: (j, c[i])
        g_hi = lambda j, i, c: (j, c[i] + 1)
        out = lambda j, i, c: (j, 0)
        kernel = _kernel
        prefetch_args = (c_blk,)
        work_tiles = n_tiles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d8), qrow, memory_space=pltpu.VMEM),
            # per-query scalars ride as [tb, 1] columns: Pallas requires
            # the LAST block dim divisible by 128 (or full), which a
            # (1, tb) row violates for tb < 128 (the TB experiments)
            pl.BlockSpec((tb, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, db), row2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), qrow, memory_space=pltpu.VMEM),
            # cluster-window half-blocks: the scalar-prefetched c_blk drives
            # the index maps (128-block units), so only the tile's <=W-wide
            # window is resident — never the full [B, C] planes
            pl.BlockSpec((tb, 128), g_lo, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), g_hi, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), g_lo, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), g_hi, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, l_bins), out, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, l_bins), out, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), out, memory_space=pltpu.VMEM),
        ],
    )
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bq, l_bins), jnp.float32),
            jax.ShapeDtypeStruct((bq, l_bins), jnp.int32),
            jax.ShapeDtypeStruct((bq, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * work_tiles * TN * (d8 + 2 * W),
            bytes_accessed=(bq // tb) * work_tiles * TN * db
            + bq * d8 * 2
            + 2 * bq * l_bins * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        *prefetch_args,
        q_perm,
        (jnp.ones((bq,), jnp.float32) if q_scale is None else q_scale).reshape(bq, 1),
        packed,
        fa_eff.reshape(1, n),
        f_rescale.reshape(1, n),
        f_error.reshape(1, n),
        cluster_of.reshape(1, n).astype(jnp.int32),
        k1x.reshape(bq, 1),
        g1,
        g1,  # same plane, second half-window index map
        g2,
        g2,
    )


def fused_select(
    q_rot: jax.Array,  # [Bp, Dpad] f32 rotated queries
    packed: jax.Array,
    fa_eff: jax.Array,
    f_rescale: jax.Array,
    f_error: jax.Array,
    cluster_of: jax.Array,
    k1x: jax.Array,
    g_add: jax.Array,  # [Bp, C] f32
    g_err: jax.Array,  # [Bp, C] f32
    probe_mask: jax.Array,  # [Bp, C] bool
    c_blk: jax.Array,
    rerank: int,
    padded_dim: int,
    int8_stage1: bool = False,
    max_tiles: int | None = None,
    direct_plane: bool = False,
    with_values: bool = False,
):
    """Stage-1 + survivor selection. Returns (cand_idx [Bp, R] int32,
    cand_ok [Bp, R] bool, probed [Bp] int32 measured offered-row counts)
    for the shared stage-2 re-rank — plus cand_val [Bp, R] f32 (the bin
    minima, best-first) appended when ``with_values``.

    ``int8_stage1`` quantizes the (permuted) query symmetrically per row
    and runs the stage-1 dot as int8 x int8 -> int32 (2x MXU throughput) —
    the fused twin of the dense path's ``scan_dtype="int8"``.

    ``direct_plane`` streams ``packed`` as a DENSE int8 code plane
    [Np, Dpad] in natural dim order (no bit-plane permute, no in-kernel
    unpack) — the exact-scan mode: feed the TOTAL plane with the
    extended factors and the bin minima are final distances, no stage-2.

    ``max_tiles`` enables probed-tile compaction: per query block, the
    union of probed clusters maps to the row tiles containing their
    unmasked rows, compacted into a scalar-prefetched tile list of static
    length ``max_tiles``; the kernel grid walks that list instead of all
    N/TN tiles. ``max_tiles`` MUST upper-bound the per-block tile count
    (see :func:`probed_tile_bound`) or probed tiles would be dropped."""
    b = q_rot.shape[0]
    # Pad the batch to a whole number of query tiles: tb is capped at TB,
    # so b_pad must be a multiple of min(TB, ceil32(b)) — padding only to
    # a multiple of 32 crashed fused_bin_scan's bq % tb == 0 assertion for
    # batches like 300 (ceil32 = 320, not a multiple of TB=128).
    assert TB % 32 == 0, TB
    tb = min(TB, ((b + 31) // 32) * 32)
    b_pad = ((b + tb - 1) // tb) * tb
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0))
        q_rot = jnp.pad(q_rot, pad)
        k1x = jnp.pad(k1x, ((0, b_pad - b),))
        g_add = jnp.pad(g_add, pad)
        g_err = jnp.pad(g_err, pad)
        probe_mask = jnp.pad(probe_mask, pad)
    c = g_add.shape[1]
    c_pad = _pad_clusters(c)
    g1 = jnp.where(probe_mask, g_add, BIG)
    if c_pad != c:
        g1 = jnp.pad(g1, ((0, 0), (0, c_pad - c)), constant_values=BIG)
        g_err = jnp.pad(g_err, ((0, 0), (0, c_pad - c)))
    q_perm = q_rot if direct_plane else permute_query(q_rot, padded_dim)
    q_scale = None
    if int8_stage1:
        qf = q_perm.astype(jnp.float32)
        q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-30) / 127.0
        q_perm = jnp.clip(
            jnp.round(qf / q_scale[:, None]), -127, 127
        ).astype(jnp.int8)

    n_tiles = packed.shape[0] // TN
    tb = min(TB, b_pad)
    tiles = tcount = None
    if max_tiles is not None:
        # a budget from a WHOLE-index bound may exceed this call's local
        # tile count (row shards, streamed chunks): clamp, don't disable —
        # every local tile listed is still strictly cheaper than the dense
        # walk's same tiles plus its masked ones
        max_tiles = min(max_tiles, n_tiles)
    if max_tiles is not None and max_tiles > 0:
        # --- probed-tile compaction ---
        # Per-tile cluster range over UNMASKED rows only (masked rows have
        # fa_eff = BIG and can never survive, so tiles holding only masked
        # rows — padding tails, fully-filtered tiles — are never needed).
        masked = fa_eff > BIG / 2
        sent_lo = jnp.where(masked, jnp.int32(c), cluster_of.astype(jnp.int32))
        sent_hi = jnp.where(masked, jnp.int32(-1), cluster_of.astype(jnp.int32))
        lo = jnp.min(sent_lo.reshape(n_tiles, TN), axis=1)  # [T]
        hi = jnp.max(sent_hi.reshape(n_tiles, TN), axis=1)
        nb = b_pad // tb
        block_probe = jnp.any(
            probe_mask.reshape(nb, tb, c), axis=1
        )  # [nb, C] union of the block's probed clusters
        ps = jnp.concatenate(
            [
                jnp.zeros((nb, 1), jnp.int32),
                jnp.cumsum(block_probe.astype(jnp.int32), axis=1),
            ],
            axis=1,
        )  # [nb, C+1]
        needed = (
            jnp.take(ps, jnp.clip(hi + 1, 0, c), axis=1)
            - jnp.take(ps, jnp.clip(lo, 0, c), axis=1)
        ) > 0  # [nb, T]: any probed cluster intersects the tile's range
        # needed-first stable compaction; padding slots repeat the last
        # valid tile so their block DMAs are no-ops in the kernel
        key = jnp.where(needed, 0, n_tiles).astype(jnp.int32) + jax.lax.iota(
            jnp.int32, n_tiles
        )[None, :]
        order_t = jnp.argsort(key, axis=1)[:, :max_tiles].astype(jnp.int32)
        tcount = jnp.minimum(
            jnp.sum(needed, axis=1, dtype=jnp.int32), max_tiles
        )
        slot = jnp.minimum(
            jnp.arange(max_tiles, dtype=jnp.int32)[None, :],
            jnp.maximum(tcount, 1)[:, None] - 1,
        )
        tiles = jnp.take_along_axis(order_t, slot, axis=1)

    bins_val, bins_idx, offered = fused_bin_scan(
        packed,
        q_perm,
        fa_eff,
        f_rescale,
        f_error,
        cluster_of,
        k1x,
        g1.astype(jnp.bfloat16),
        jnp.asarray(g_err, jnp.bfloat16),
        c_blk,
        q_scale=q_scale,
        tiles=tiles,
        tcount=tcount,
    )
    r = min(rerank, n_bins())
    neg_lb, pos = jax.lax.top_k(-bins_val, r)
    cand_idx = jnp.take_along_axis(bins_idx, pos, axis=1)
    cand_ok = (neg_lb > -BIG / 2) & (cand_idx >= 0)
    probed = jnp.sum(offered, axis=1, dtype=jnp.int32)
    if with_values:
        return cand_idx[:b], cand_ok[:b], -neg_lb[:b], probed[:b]
    return cand_idx[:b], cand_ok[:b], probed[:b]
