#!/bin/bash
# Round-3 TPU re-measurement sequence (run when the axon tunnel is up).
# One TPU client at a time, ~90 s cooldown between clients (a client
# started too soon after another exits can wedge or run 10x degraded).
# Logs land in /tmp/remeasure_*.log; inspect each before trusting QPS.
set -u
cd "$(dirname "$0")/.."

echo "=== 1) verify drive (bindings, small scale) ==="
timeout 1500 python - <<'EOF' 2>&1 | tee /tmp/remeasure_verify.log
import numpy as np, time, sys
def log(*a): print(*a, flush=True)
import jax; log("devices:", jax.devices())
from rabitq_tpu.bindings import IvfRabitqIndex, MstgIndex
rng = np.random.default_rng(42)
data = rng.random((10_000, 128), dtype=np.float32)

def batch_vs_single(big0, one, query, tag):
    # Uniform-random data has a dense band of near-tied neighbors (ranks
    # ~5-15 differ by 0.03-2% — inside 7-bit estimation error), and XLA
    # tiles the [B, C]/[B, N] math differently per batch shape, so exact
    # id equality across batch sizes is NOT guaranteed on hardware. A
    # real bug (dropped tiles, wrong masks) loses many ids or inflates
    # distances; tie reordering swaps a couple at the tail. So: self-hit
    # first, >=8/10 id overlap, and every returned distance must match
    # the EXACT L2 of its own retrieved id (estimator correctness).
    assert big0[0, 0] == 0 and one[0, 0] == 0, (tag, big0[:, 0], one[:, 0])
    common = len(set(big0[:, 0].astype(int)) & set(one[:, 0].astype(int)))
    assert common >= 8, (tag, common, big0[:, 0], one[:, 0])
    for res in (big0, one):
        exact = ((data[res[:, 0].astype(int)] - query) ** 2).sum(1)
        np.testing.assert_allclose(res[:, 1], exact, rtol=2e-2, atol=0.08,
                                   err_msg=tag)

ivf = IvfRabitqIndex(128)
t0 = time.time(); ivf.fit(data, nlist=128); log("ivf fit:", round(time.time()-t0,1), "s")
q = data[:300]
big = ivf.batch_query(q, k=10, nprobe=32)
one = ivf.batch_query(q[:1], k=10, nprobe=32)[0]
batch_vs_single(big[0], one, q[0], "ivf")
t0=time.time(); ivf.batch_query(q, k=10, nprobe=32); log("ivf 300-q warm:", round(time.time()-t0,2), "s")
m = MstgIndex(128, max_posting_size=256)
t0 = time.time(); m.fit(data); log("mstg fit:", round(time.time()-t0,1), "s")
bigm = m.batch_query(q, k=10)
onem = m.batch_query(q[:1], k=10)[0]
batch_vs_single(bigm[0], onem, q[0], "mstg")
for row in bigm: assert len(set(row[:,0].tolist())) == len(row)
t0=time.time(); m.batch_query(q, k=10); log("mstg 300-q warm:", round(time.time()-t0,2), "s")
log("VERIFY-OK")
EOF
sleep 90

echo "=== 2) headline bench (1M, IVF + MSTG, polished partition) ==="
timeout 7200 python bench.py 2>/tmp/remeasure_bench.log \
  | tee /tmp/remeasure_bench.json
sleep 90

echo "=== 3) MSTG tuned recall@100 sweep on the materialized 1M dataset ==="
timeout 7200 python -m rabitq_tpu sweep \
  --data data/synth1m/base.fvecs --queries data/synth1m/query.fvecs \
  --groundtruth data/synth1m/gt100.ivecs --method mstg --k 100 \
  --efs 64 128 256 512 1024 2048 --epsilons 0.6 \
  --max-posting-size 1000 --scan-dtype fused8 --rerank 4000 \
  --output benchmarks/synth1m_recall100_mstg_tuned.csv \
  2>&1 | tee /tmp/remeasure_sweep.log
echo "=== done ==="
