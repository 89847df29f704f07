"""Measure TRUE dataset-upload time per encoding (round 5).

tools/kmeans_cold_iter.py showed that device_put + block_until_ready
return long before the axon tunnel has actually drained a bulk upload:
a fresh process's first scalar device_get stalls 100-500 s (session-
dependent) — the remaining transfer time — which the bench misattributed
to k-means ("lloyd_s=104 s" for 1.1 s of compute). This probe times, in
one fresh process:

  0. control: tiny get on a small array (baseline RTT)
  1. per encoding (bf16, int8): client-side upload_dataset time, then a
     tiny get = the real drain; true upload = put + drain

Usage: python tools/upload_drain_probe.py [--rows N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import load_or_make_workload, log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    from rabitq_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    data, _ = load_or_make_workload(args.rows, 2048, 960, 2048, rng)

    from rabitq_tpu.utils.transfer import upload_dataset

    results = {}
    t = time.time()
    x = jnp.ones((8, 8), jnp.float32)
    _ = float(jnp.sum(x))
    results["control_get_s"] = round(time.time() - t, 2)
    log(f"control tiny-get: {results['control_get_s']}s")

    for enc in ("bf16", "int8"):
        t = time.time()
        data_dev, rep = upload_dataset(data, enc)
        put_s = time.time() - t
        t = time.time()
        # scalar get serializes behind every queued put in the tunnel's
        # service queue -> measures the real remaining transfer
        _ = float(data_dev[-1, -1])
        drain_s = time.time() - t
        true_s = put_s + drain_s
        results[enc] = {
            "client_put_s": round(put_s, 1),
            "drain_s": round(drain_s, 1),
            "true_s": round(true_s, 1),
            "true_mb_per_s": round(rep["bytes"] / 1e6 / true_s, 1),
        }
        log(f"{enc}: {json.dumps(results[enc])}")
        del data_dev

    print(json.dumps(results))


if __name__ == "__main__":
    main()
