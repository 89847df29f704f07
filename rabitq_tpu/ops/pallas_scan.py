"""Pallas TPU kernel: fused packed-bitplane lower-bound scan.

Stage 1 of the RaBitQ scan computes, for every stored row r and query b,

    lb[b, r] = f_add[r] + f_rescale[r] * (<binary[r], q[b]> + k1x[b]) + g_comb[b, r]

where ``g_comb`` folds the per-(query, cluster) terms. The XLA path streams
dense int8 codes (1 byte/dim) and materializes an int32 matmul accumulator
before the fused epilogue. This kernel instead:

* reads binary codes PACKED at 1 bit/dim (8x less code traffic from HBM),
* unpacks each tile in VMEM with shift/mask VPU ops (codes <= 127 are
  exact in bf16),
* runs the [TB, D8] x [D8, TN] matmul on the MXU, and
* applies the estimator epilogue in-register, writing bf16 lower bounds —
  the int32 accumulator never touches HBM.

Bit layout: byte j, bit k (LSB-first) of a packed row holds dimension
``j*8 + k``; the kernel's unpack concatenates bit-planes so position
``p = k*Db + j`` of the unpacked tile is that dimension. Queries are
pre-permuted to match (``permute_query``) — the dot product is invariant.

This is the TPU-native answer to the reference's AVX2/AVX-512 FastScan
accumulate over nibble-interleaved codes (lqhl/rabitq-rs
``simd.rs:972-1186``): same memory-compression idea, recast for MXU+VPU,
and exact (no i8-LUT quantization of the query).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile and query-tile sizes. TN must divide the (padded) row count;
# index row padding is a multiple of 128.
TN = 128
TB = 256


def packed_bytes(padded_dim: int) -> int:
    """Packed bytes per row, padded to the TPU lane width (128)."""
    db = (padded_dim + 7) // 8
    return ((db + 127) // 128) * 128


@functools.partial(jax.jit, static_argnames=("padded_dim",))
def pack_bitplanes(binary: jax.Array, padded_dim: int) -> jax.Array:
    """[N, Dpad] {0,1} int8 -> [N, Db] uint8 with byte j bit k = dim j*8+k."""
    n = binary.shape[0]
    db = packed_bytes(padded_dim)
    pad = db * 8 - padded_dim
    b = binary.astype(jnp.int32)
    if pad:
        b = jnp.pad(b, ((0, 0), (0, pad)))
    b = b.reshape(n, db, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, None, :]
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def pack_bitplanes_np(binary: np.ndarray, padded_dim: int) -> np.ndarray:
    """Host-side ``pack_bitplanes`` (same layout) for streamed-tier chunks
    that must stay off-device until upload."""
    n = binary.shape[0]
    db = packed_bytes(padded_dim)
    pad = db * 8 - padded_dim
    b = np.asarray(binary, np.uint16)
    if pad:
        b = np.pad(b, ((0, 0), (0, pad)))
    b = b.reshape(n, db, 8)
    weights = (1 << np.arange(8, dtype=np.uint16))[None, None, :]
    return (b * weights).sum(axis=-1).astype(np.uint8)


def permute_query(q_rot: jax.Array, padded_dim: int) -> jax.Array:
    """[B, Dpad] -> [B, 8*Db] bf16 in bit-plane order (p = k*Db + j)."""
    b = q_rot.shape[0]
    db = packed_bytes(padded_dim)
    pad = db * 8 - padded_dim
    q = q_rot
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad)))
    # position k*Db + j must hold dim j*8 + k
    q = q.reshape(b, db, 8).transpose(0, 2, 1).reshape(b, 8 * db)
    return q.astype(jnp.bfloat16)


def _lb_kernel(f_add_ref, f_rescale_ref, k1x_ref, packed_ref, q_ref, g_ref, o_ref):
    x = packed_ref[:].astype(jnp.int32)  # [TN, Db]
    bits = jnp.concatenate(
        [((x >> k) & 1) for k in range(8)], axis=-1
    ).astype(jnp.bfloat16)  # [TN, 8*Db]
    acc = jax.lax.dot_general(
        q_ref[:],
        bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TB, TN]
    lb = (
        f_add_ref[0, :][None, :]
        + f_rescale_ref[0, :][None, :] * (acc + k1x_ref[0, :][:, None])
        + g_ref[:].astype(jnp.float32)
    )
    o_ref[:] = lb.astype(jnp.bfloat16)


def packed_lb_scan(
    packed: jax.Array,  # [Np, Db] uint8 (Np % TN == 0, Db % 128 == 0)
    q_perm: jax.Array,  # [Bp, 8*Db] bf16 (Bp % TB == 0)
    f_add: jax.Array,  # [Np] f32
    f_rescale: jax.Array,  # [Np] f32
    k1x: jax.Array,  # [Bp] f32 (c1 * sum(q))
    g_comb: jax.Array,  # [Bp, Np] bf16: g_add - f_error*g_error, UNMASKED —
    # callers apply the probe/filter mask to the returned lower bounds
    # (masking inside via +inf would poison the bf16 epilogue with NaNs)
) -> jax.Array:
    """Fused stage-1 lower bounds: returns [Bq, Np] bf16."""
    n, db = packed.shape
    bq, d8 = q_perm.shape
    assert n % TN == 0 and db % 128 == 0 and d8 == 8 * db
    # Pad the batch to a whole number of query tiles (the sharded wrapper
    # replicates queries without pow2 padding; single-chip callers pad
    # upstream, making this a no-op there). Trimmed before returning.
    b_in = bq
    tb = min(TB, bq)
    b_pad = ((bq + tb - 1) // tb) * tb
    if b_pad != bq:
        q_perm = jnp.pad(q_perm, ((0, b_pad - bq), (0, 0)))
        k1x = jnp.pad(k1x, ((0, b_pad - bq),))
        g_comb = jnp.pad(g_comb, ((0, b_pad - bq), (0, 0)))
        bq = b_pad
    grid = (n // TN, bq // tb)

    # interpret mode lets the same code run on CPU (tests / virtual meshes)
    interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        _lb_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, db), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, TN), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, TN), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bq, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * n * d8,
            bytes_accessed=n * db + bq * d8 * 2 + 2 * bq * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        f_add.reshape(1, n),
        f_rescale.reshape(1, n),
        k1x.reshape(1, bq),
        packed,
        q_perm,
        g_comb,
    )
    return out[:b_in]
