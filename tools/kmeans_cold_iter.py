"""Per-iteration timing of the PROCESS-COLD k-means slowdown.

tools/kmeans_bench_gap.py isolated the bench's 104-135 s lloyd_s to a
process-cold effect: the FIRST k-means run in a fresh process spends
100-500 s in Lloyd iterations 2..8 (executables persistent-cache-hit,
iteration 1 fast at 0.15 s), while an identical rerun in the same
process takes ~1.1 s. This probe times each Lloyd dispatch separately
in a fresh process, first WITHOUT the early-stop objective fetch, then
WITH it, then warm — to localize the stall (uniform per-iter vs one
cliff; execution vs the mid-loop scalar device_get).

Usage: python tools/kmeans_cold_iter.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import load_or_make_workload, log  # noqa: E402


def main():
    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, _ = load_or_make_workload(1_000_000, 2048, 960, 2048, rng)

    from rabitq_tpu.ops.kmeans import _kmeanspp_init, _lloyd_step, _pad_pow2
    from rabitq_tpu.utils.transfer import upload_dataset

    t0 = time.time()
    data_dev, rep = upload_dataset(data, "bf16")
    log(f"upload: {rep}")

    k, block, n = 4096, 4096, 1_000_000
    nt_pad = ((n + block - 1) // block) * block
    train = jnp.concatenate(
        [data_dev, jnp.zeros((nt_pad - n, 960), jnp.float32)]
    )
    train.block_until_ready()
    log(f"train_dev ready at t+{time.time() - t0:.1f}s")

    key = jax.random.PRNGKey(42 * 1_000_003)
    m = _pad_pow2(64 * k)
    t = time.time()
    cent = _kmeanspp_init(jax.lax.slice_in_dim(train, 0, m, axis=0), key, k, m)
    cent.block_until_ready()
    log(f"init: {time.time() - t:.2f}s")

    results = {}
    for name, fetch in (("cold_nofetch", False), ("mid_fetch", True),
                        ("warm_nofetch", False)):
        iter_s, c = [], cent
        tloop = time.time()
        for i in range(8):
            t = time.time()
            c, obj = _lloyd_step(train, c, k, block, n, False, "bf16")
            if fetch:
                o = float(obj)  # the early-stop pattern's scalar get
            else:
                c.block_until_ready()
            iter_s.append(round(time.time() - t, 2))
        c.block_until_ready()
        total = round(time.time() - tloop, 2)
        results[name] = {"iters": iter_s, "total_s": total}
        log(f"{name}: total={total}s iters={iter_s}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
