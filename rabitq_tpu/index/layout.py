"""Shared device-layout assembler for every index family.

All four engines (IVF, brute-force, MSTG, streamed) store codes the same
way on device: dense int8 planes ``[Np, Dpad]`` plus flat per-row factor
vectors, rows grouped by cluster in HOST order but pseudorandomly permuted
in the DEVICE layout (see :func:`rabitq_tpu.index.scan.device_row_permutation`
— required for ``approx_max_k`` accuracy), padded to a multiple of
``_ROW_PAD`` with invalid tail rows.

This module is the ONE place those invariants live (the reference's
analogue is ``ClusterData::from_quantized_vectors``, ``ivf.rs:409-522``,
its single layout builder). Round 1 had four hand-rolled copies plus a
chunked variant; any layout change now edits this file only.

Inputs may be host numpy arrays (pad+permute on host, upload once) or
device ``jax.Array``s (pad+gather on device — no host round trip).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .scan import device_row_permutation, ex_plane_is_total, make_refine_plane

_ROW_PAD = 128  # device row padding multiple

_SCALARS = ("f_add", "f_rescale", "f_error", "f_add_ex", "f_rescale_ex")


def pad_rows(n: int, row_pad: int = _ROW_PAD) -> int:
    """Total device rows for ``n`` real rows."""
    return max(row_pad, ((n + row_pad - 1) // row_pad) * row_pad)


def cluster_of_rows(cluster_sizes: np.ndarray, n_pad: int) -> np.ndarray:
    """Per-row cluster id for cluster-sorted rows ([C] sizes -> [n_pad])."""
    sizes = np.asarray(cluster_sizes, np.int64)
    out = np.zeros(n_pad, np.int32)
    out[: int(sizes.sum())] = np.repeat(
        np.arange(len(sizes), dtype=np.int32), sizes
    )
    return out


def refine_plane_dtype(ex_bits: int):
    """int8 when the refine plane fits (total codes <= 127 or raw ex <= 127),
    else int32 (ex_bits > 7 magnitude codes)."""
    return np.int8 if ex_bits <= 7 else np.int32


@dataclass
class DeviceLayout:
    """Device-resident arrays in the scan kernel's expected layout.

    ``binary`` is None for fused layouts whose refine plane holds TOTAL
    codes: stage 1 reads the packed bitplanes and stage 2 only the total
    plane, so the dense [Np, Dpad] int8 binary plane would be ~1 GB of
    dead HBM weight per 1M x 960 index (the reference stores each datum
    once too, ``ivf.rs:205-242``). It is rebuilt from the total plane on
    layout-mode switches (total >> ex_bits).
    """

    binary: jax.Array | None  # [Np, Dpad] int8 {0,1} (None: fused+total)
    ex: jax.Array  # [Np, Dpad] refine plane (see scan.make_refine_plane)
    f_add: jax.Array  # [Np] f32
    f_rescale: jax.Array
    f_error: jax.Array
    f_add_ex: jax.Array
    f_rescale_ex: jax.Array
    cluster_of: jax.Array  # [Np] int32
    valid: jax.Array  # [Np] bool
    ids: jax.Array  # [Np] int32 original vector ids (-1 on padding)
    centroids: jax.Array  # [C, Dpad] f32
    perm: np.ndarray  # host->device row permutation actually used
    delta: jax.Array | None = None  # [Np] f32 (reconstruction; IVF keeps it)
    vl: jax.Array | None = None
    packed: jax.Array | None = None  # [Np, Db] uint8 bitplanes (fused layouts)

    def scan_args(self) -> tuple:
        """Positional (binary..ids) args of ``scan_kernel`` in order."""
        return (
            self.binary,
            self.ex,
            self.f_add,
            self.f_rescale,
            self.f_error,
            self.f_add_ex,
            self.f_rescale_ex,
            self.cluster_of,
            self.valid,
            self.ids,
        )


def _pad_permute(x, n: int, n_pad: int, perm: np.ndarray, dtype) -> jax.Array:
    """Trim to ``n`` rows, zero-pad to ``n_pad``, apply the row permutation.

    numpy input: permute on host, upload the final layout once.
    jax input: pad + gather on device (the build pipeline's outputs never
    touch the host).
    """
    x = x[:n]
    if isinstance(x, jax.Array):
        widths = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.take(jnp.pad(x.astype(dtype), widths), jnp.asarray(perm), axis=0)
    x = np.asarray(x)
    out = np.zeros((n_pad, *x.shape[1:]), dtype)
    out[:n] = x
    return jnp.asarray(out[perm])


def assemble_device_layout(
    *,
    n: int,
    ex_bits: int,
    binary,  # [>=n, Dpad] {0,1} codes (np or jax, any int dtype)
    ex,  # [>=n, Dpad] RAW ex codes (np or jax; NOT the refine plane)
    f_add,
    f_rescale,
    f_add_ex,
    f_rescale_ex,
    f_error=None,  # omit (or zero_f_error=True) -> zeros, like MSTG's scan
    cluster_sizes: np.ndarray,  # [C] rows per cluster, cluster-sorted order
    ids: np.ndarray,  # [n] original vector ids
    centroids,  # [C, Dpad] f32 (np or jax)
    delta=None,
    vl=None,
    zero_f_error: bool = False,  # MSTG zeroes f_error in its scan (mstg/index.rs:285)
    row_pad: int = _ROW_PAD,
    permute: bool = True,  # False: keep cluster-sorted order (fused Pallas
    # scan — its mod-L binning needs no iid scatter and its g-term windows
    # need cluster-contiguous rows; approx_max_k paths need permute=True)
    keep_binary: bool = False,  # force-keep the dense binary plane even in
    # fused layouts (needed when stage-2 refinement is DISABLED: the 1-bit
    # re-score reads it)
) -> DeviceLayout:
    """Build the padded + permuted device layout from cluster-sorted rows."""
    n_pad = pad_rows(n, row_pad)
    perm = (
        device_row_permutation(n, n_pad)
        if permute
        else np.arange(n_pad, dtype=np.int64)
    )

    cluster_of = cluster_of_rows(cluster_sizes, n_pad)
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    ids_pad = np.full(n_pad, -1, np.int32)
    ids_pad[:n] = np.asarray(ids)[:n].astype(np.int32)

    # refine plane from raw codes; int8 whenever it fits (scan.ex_plane_is_total)
    plane = make_refine_plane(binary[:n], ex[:n], ex_bits)
    ex_dt = refine_plane_dtype(ex_bits)

    def scalar(x):
        return _pad_permute(x, n, n_pad, perm, np.float32)

    binary_dev = _pad_permute(binary, n, n_pad, perm, np.int8)
    packed_dev = None
    if not permute:
        # fused layouts: stage 1 streams packed bitplanes; when the refine
        # plane holds TOTAL codes (and refinement is on) stage 2 never
        # reads the dense binary plane either — don't keep ~1 byte/dim of
        # dead HBM per row (the streamed tier already dropped it from its
        # upload chunks)
        from ..ops.pallas_scan import pack_bitplanes

        packed_dev = pack_bitplanes(binary_dev, binary_dev.shape[1])
        if ex_plane_is_total(ex_bits) and not keep_binary:
            binary_dev = None

    ex_dev = _pad_permute(plane, n, n_pad, perm, ex_dt)
    if not permute and ex_dev.shape[1] % 128:
        # fused layouts width-pad the refine plane to the kernel's
        # 128-lane alignment so the EXACT scan mode (scan.py fused_exact:
        # stream this plane through the bin kernel, no stage-2) works at
        # any quant dim. Zero columns never change a dot; host downloads
        # slice them back off (_download_host in ivf/mstg).
        ex_dev = jnp.pad(ex_dev, ((0, 0), (0, (-ex_dev.shape[1]) % 128)))

    return DeviceLayout(
        binary=binary_dev,
        packed=packed_dev,
        ex=ex_dev,
        f_add=scalar(f_add),
        f_rescale=scalar(f_rescale),
        f_error=jnp.zeros(n_pad, jnp.float32)
        if (zero_f_error or f_error is None)
        else scalar(f_error),
        f_add_ex=scalar(f_add_ex),
        f_rescale_ex=scalar(f_rescale_ex),
        cluster_of=jnp.asarray(cluster_of[perm]),
        valid=jnp.asarray(valid[perm]),
        ids=jnp.asarray(ids_pad[perm]),
        centroids=jnp.asarray(centroids, jnp.float32)
        if not isinstance(centroids, jax.Array)
        else centroids,
        perm=perm,
        delta=scalar(delta) if delta is not None else None,
        vl=scalar(vl) if vl is not None else None,
    )


def assemble_host_chunks(
    *,
    n: int,
    ex_bits: int,
    binary: np.ndarray,
    ex: np.ndarray,
    f_add: np.ndarray,
    f_rescale: np.ndarray,
    f_error: np.ndarray,
    f_add_ex: np.ndarray,
    f_rescale_ex: np.ndarray,
    cluster_sizes: np.ndarray,
    ids: np.ndarray,
    chunk_rows: int,
    zero_f_error: bool = False,
    row_pad: int = _ROW_PAD,
    fused: bool = False,
) -> list[dict]:
    """Chunked variant for the streamed tier: the SAME permuted layout,
    split into host-resident slabs of ``chunk_rows`` (each padded to
    ``row_pad``) that upload lazily per query batch.

    One global scatter keeps ``approx_max_k`` bins iid within each chunk.

    ``fused=True`` targets the fused Pallas scan instead: rows stay
    CLUSTER-SORTED (no scatter), chunks pad to the kernel's TN row tiles,
    and each chunk carries ``packed`` 1-bit code planes (8x fewer upload
    bytes than the dense int8 plane — the streamed tier is
    transfer-bound) plus its ``cblk`` cluster-window indices. When the
    refine plane holds TOTAL codes the dense binary plane is omitted
    entirely (stage 2 never reads it).
    """
    if fused:
        from ..ops.pallas_fused_scan import TN

        row_pad = TN
        perm = np.arange(n, dtype=np.int64)
    else:
        perm = device_row_permutation(n, n)[:n]
    cluster_of = cluster_of_rows(cluster_sizes, n)[perm]
    ids_p = np.asarray(ids).astype(np.int32)[perm]
    binary_p = np.asarray(binary)[perm]
    plane = np.asarray(make_refine_plane(binary_p, np.asarray(ex)[perm], ex_bits))
    ex_dt = refine_plane_dtype(ex_bits)
    scal = {
        "f_add": np.asarray(f_add, np.float32)[perm],
        "f_rescale": np.asarray(f_rescale, np.float32)[perm],
        "f_error": np.zeros(n, np.float32)
        if zero_f_error
        else np.asarray(f_error, np.float32)[perm],
        "f_add_ex": np.asarray(f_add_ex, np.float32)[perm],
        "f_rescale_ex": np.asarray(f_rescale_ex, np.float32)[perm],
    }

    chunks = []
    for s in range(0, n, chunk_rows):
        e = min(s + chunk_rows, n)
        rows = e - s
        m = rows + ((-rows) % row_pad)

        def pad2(x, dtype):
            out = np.zeros((m, x.shape[1]), dtype)
            out[:rows] = x[s:e]
            return out

        def pad1(x, fill=0):
            out = np.full(m, fill, x.dtype)
            out[:rows] = x[s:e]
            return out

        valid = np.zeros(m, bool)
        valid[:rows] = True
        chunk = dict(
            binary=pad2(binary_p, np.int8),
            ex=pad2(plane, ex_dt),
            cluster_of=pad1(cluster_of),
            ids=pad1(ids_p, fill=-1),
            valid=valid,
            **{k: pad1(v) for k, v in scal.items()},
        )
        if fused:
            from ..ops.pallas_fused_scan import tile_cluster_blocks
            from ..ops.pallas_scan import pack_bitplanes_np

            dpad = chunk["binary"].shape[1]
            chunk["packed"] = pack_bitplanes_np(chunk["binary"], dpad)
            chunk["cblk"] = tile_cluster_blocks(chunk["cluster_of"], valid)
            if ex_plane_is_total(ex_bits):
                # stage 1 reads packed planes, stage 2 the TOTAL plane:
                # the dense binary plane would be pure upload waste
                del chunk["binary"]
        chunks.append(chunk)
    return chunks
