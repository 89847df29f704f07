"""High-throughput serving: the fused kernel + pipelined query uploads.

The production serving recipe on TPU (measured in BENCHMARKS.md):

* ``scan_dtype="fused"`` — the Pallas scan+select kernel; stage 1 never
  materializes a [B, N] tensor in HBM.
* ``upload_dtype="int8"`` (or ``"bf16"``) — quarter / half the query
  bytes over the host link; int8 measured fastest at every block size
  (BENCHMARKS.md "Upload encoding").
* ``batch_search_arrays_pipelined`` — block i+1's upload overlaps block
  i's scan; one final fetch for all results.

``MstgIndex`` serves the same way: ``mstg.upload_dtype = "int8"`` +
``mstg.batch_search_pipelined(queries, params, batch_size=256)``.

Run: python examples/pipelined_serving.py
"""

import time

import numpy as np

from rabitq_tpu import IvfRabitqIndex, Metric, SearchParams

rng = np.random.default_rng(0)
data = rng.random((50_000, 256), dtype=np.float32)
queries = data[:4096] + 0.01 * rng.standard_normal((4096, 256)).astype(np.float32)

index = IvfRabitqIndex.train(
    data,
    nlist=256,
    total_bits=7,
    metric=Metric.L2,
    seed=42,
    use_faster_config=True,
    scan_dtype="fused",
)
index.upload_dtype = "int8"
params = SearchParams(top_k=10, nprobe=16)

ids, dists = index.batch_search_arrays_pipelined(queries, params, batch_size=256)
t0 = time.time()
ids, dists = index.batch_search_arrays_pipelined(queries, params, batch_size=256)
dt = time.time() - t0
print(f"{len(queries)} queries in {dt*1000:.0f} ms ({len(queries)/dt:.0f} QPS)")
print("query 0 neighbors:", ids[0][:5], "self-match:", ids[0][0] == 0)
