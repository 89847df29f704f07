"""Host->device dataset upload with reduced-precision encoding.

The TPU tunnel moves bulk data at ~18-70 MB/s (occasionally ~1 GB/s);
a 1M x 960 f32 dataset is 3.84 GB — often several minutes of a build's
wall clock (the reference's build reads from local disk instead,
``ivf.rs:950-1021``, so it never pays this). Quantization consumes
RESIDUALS whose magnitude dwarfs reduced-precision rounding:

- ``bf16`` halves the bytes; 2^-9 relative rounding on raw coordinates
  is far below the 7-bit code quantization noise.
- ``int8`` quarters the bytes with a per-row symmetric scale (~0.4%
  relative rounding) — still below code noise at total_bits <= 8, and
  the k-means / groundtruth geometry is unaffected at the recall
  tolerances the bench checks (measured, BENCHMARKS.md "Build upload
  encoding").

``auto`` keeps small uploads exact (tests compare against the numpy
oracle byte-for-byte on tiny datasets) and switches to bf16 above
512 MB where the tunnel cost dominates.
"""

from __future__ import annotations

import time

import numpy as np

_AUTO_THRESHOLD_BYTES = 512 * 1024 * 1024


def warm_session() -> float:
    """Pay the tunnel's per-process session cost; returns seconds spent.

    The first real device sync (a ``device_get``) in a fresh process
    stalls 20-200 s on the remote-TPU tunnel — per-client session setup,
    worst right after another client exits (measured,
    ``tools/upload_drain_probe.py``; BENCHMARKS.md "The async-put
    illusion"). Until that first sync, ``device_put`` and
    ``block_until_ready`` return while work is still streaming, so
    client-side timings are buffered-write illusions. Call this once
    before timed device work — ideally on a background thread overlapped
    with host-side setup (bench.py does) — so the cost lands in an
    explicit ``session_warmup_s`` instead of silently inflating the
    first build phase that happens to sync.
    """
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    jax.device_get(jnp.zeros((8, 128), jnp.float32).sum())
    return round(time.time() - t0, 2)


def resolve_encoding(data: np.ndarray, encoding: str = "auto") -> str:
    if encoding == "auto":
        return "bf16" if data.nbytes > _AUTO_THRESHOLD_BYTES else "f32"
    if encoding not in ("f32", "bf16", "int8"):
        raise ValueError(f"unknown dataset upload encoding {encoding!r}")
    return encoding


def upload_dataset(data: np.ndarray, encoding: str = "auto", chunk_rows: int = 262_144):
    """Upload [N, dim] rows; returns (f32 device array, report dict).

    The device array is always f32 (decoded on device) so every consumer
    (k-means, quantizer, groundtruth) is encoding-agnostic. Host-side
    conversion and puts run per ``chunk_rows`` chunk to bound peak host
    memory on mmap-backed inputs.
    """
    import jax
    import jax.numpy as jnp

    requested = encoding
    encoding = resolve_encoding(data, encoding)
    if requested == "auto" and encoding != "f32":
        # not silent: auto'd reduced-precision uploads mean the device
        # contents (codes, centroids, saved files) are no longer
        # bit-reproducible against an f32 build — measured recall-neutral
        # (BENCHMARKS.md "Build upload encoding") but worth a line. Pass
        # data_upload="f32" to the build config to force exact uploads.
        from .logging import get_logger

        get_logger("transfer").info(
            "dataset upload auto-selected %s encoding (%.0f MB > %d MB "
            "threshold); pass data_upload='f32' for bit-exact uploads",
            encoding, data.nbytes / 1e6, _AUTO_THRESHOLD_BYTES // (1024 * 1024),
        )
    n = data.shape[0]
    if n == 0:
        import jax.numpy as jnp

        return (
            jnp.zeros(data.shape, jnp.float32),
            {"encoding": encoding, "bytes": 0, "seconds": 0.0, "mb_per_s": 0.0},
        )
    t0 = time.time()
    sent_bytes = 0
    parts = []
    scales = []
    for s in range(0, n, chunk_rows):
        blk = np.ascontiguousarray(data[s : s + chunk_rows], np.float32)
        if encoding == "f32":
            enc = blk
        elif encoding == "bf16":
            import ml_dtypes

            enc = blk.astype(ml_dtypes.bfloat16)
        else:  # int8, symmetric per-row scale
            scale = np.maximum(np.abs(blk).max(axis=1), 1e-30) / 127.0
            enc = np.clip(np.rint(blk / scale[:, None]), -127, 127).astype(np.int8)
            scales.append(jax.device_put(scale.astype(np.float32)))
        sent_bytes += enc.nbytes
        parts.append(jax.device_put(enc))
    if encoding == "int8":
        dec = [p.astype(jnp.float32) * sc[:, None] for p, sc in zip(parts, scales)]
    elif encoding == "bf16":
        dec = [p.astype(jnp.float32) for p in parts]
    else:
        dec = parts
    data_dev = dec[0] if len(dec) == 1 else jnp.concatenate(dec, axis=0)
    data_dev.block_until_ready()
    # block_until_ready on the remote tunnel can return while the puts
    # are still streaming (client-side buffering): a scalar device_get
    # serializes behind every queued put, so the reported seconds are the
    # TRUE transfer time and the residue doesn't leak into the caller's
    # next sync (rounds 4-5 misattributed it as k-means Lloyd time —
    # BENCHMARKS.md "The async-put illusion").
    jax.device_get(data_dev[-1, -1])
    dt = time.time() - t0
    report = {
        "encoding": encoding,
        "bytes": int(sent_bytes),
        "seconds": round(dt, 2),
        "mb_per_s": round(sent_bytes / 1e6 / max(dt, 1e-9), 1),
    }
    return data_dev, report
