"""Isolate the tunnel's fixed per-dispatch cost — no index needed.

Round-3/4 serving probes show ~10-12 ms per dispatch that is neither
device compute nor put bytes (block_scaling_probe: dispatch-only 16.8 ms
per b=256 block vs ~5 ms compute). This probe times tiny jitted programs
in a pipelined loop (enqueue many, one device_get) to decompose that
fixed cost along the axes the serving path controls:

  * arg count        — does each device-array argument add service time?
  * host scalars     — a traced Python-int arg costs a device_put per
                       call; the serving loop passes nprobe (+epsilon,
                       +offset) this way.
  * output count     — one packed output vs two separate arrays.
  * fetch            — device_get per block vs one deferred device_get.
  * depth            — 8 vs 32 enqueued dispatches (queue saturation).

Usage: python tools/dispatch_floor_probe.py [--reps 5] [--n 16]
Prints one JSON line of microseconds-per-dispatch per variant.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n", type=int, default=16, help="dispatches per rep")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    # a b=256 query block and some filler operands, device-resident
    q = jax.device_put(rng.standard_normal((256, 960), dtype=np.float32))
    ops = [
        jax.device_put(rng.standard_normal((256, 64), dtype=np.float32))
        for _ in range(12)
    ]
    jax.block_until_ready([q] + ops)

    def timed(name, fn, *, per_block_get=False, n=None, reps=None):
        n = n or args.n
        reps = reps or args.reps
        fn()  # warm-up/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            if per_block_get:
                for _ in range(n):
                    jax.device_get(fn_one())
            else:
                jax.device_get([fn_one() for _ in range(n)])
            dt = (time.time() - t0) / n
            best = min(best, dt)
        log(f"{name:28s} {best*1e3:8.3f} ms/dispatch")
        return round(best * 1e3, 3)

    results = {}

    # --- 1 arg, 1 tiny output: the floor ---
    @jax.jit
    def f1(q):
        return jnp.sum(q, axis=1)[:8]

    fn_one = lambda: f1(q)  # noqa: E731
    results["floor_1arg_1out"] = timed("floor 1 arg 1 out", lambda: f1(q))

    # --- 13 args (serving-path arity), 1 tiny output ---
    @jax.jit
    def f13(q, *ops):
        acc = jnp.sum(q, axis=1)
        for o in ops:
            acc = acc + jnp.sum(o, axis=1)
        return acc[:8]

    fn_one = lambda: f13(q, *ops)  # noqa: E731
    results["args13_1out"] = timed("13 args 1 out", lambda: f13(q, *ops))

    # --- 13 args + 2 traced host scalars (like nprobe/epsilon) ---
    @jax.jit
    def f13s(q, nprobe, eps, *ops):
        acc = jnp.sum(q, axis=1) * eps + nprobe
        for o in ops:
            acc = acc + jnp.sum(o, axis=1)
        return acc[:8]

    fn_one = lambda: f13s(q, 4, 0.0, *ops)  # noqa: E731
    results["args13_2hostscalars"] = timed(
        "13 args + 2 host scalars", lambda: f13s(q, 4, 0.0, *ops)
    )

    # --- same, scalars pre-put on device once ---
    dnp = jax.device_put(jnp.int32(4))
    dep = jax.device_put(jnp.float32(0.0))
    jax.block_until_ready([dnp, dep])
    fn_one = lambda: f13s(q, dnp, dep, *ops)  # noqa: E731
    results["args13_2devscalars"] = timed(
        "13 args + 2 dev scalars", lambda: f13s(q, dnp, dep, *ops)
    )

    # --- two outputs vs one packed output ([256,10] each) ---
    @jax.jit
    def f2out(q):
        s = jnp.sum(q, axis=1)
        return (
            jnp.broadcast_to(s[:, None], (256, 10)).astype(jnp.int32),
            jnp.broadcast_to(s[:, None], (256, 10)),
        )

    @jax.jit
    def f1out(q):
        s = jnp.sum(q, axis=1)
        ids = jnp.broadcast_to(s[:, None], (256, 10)).astype(jnp.int32)
        d = jnp.broadcast_to(s[:, None], (256, 10))
        return jnp.concatenate([ids, jax.lax.bitcast_convert_type(d, jnp.int32)], 1)

    fn_one = lambda: f2out(q)  # noqa: E731
    results["out2_arrays"] = timed("2 output arrays", lambda: f2out(q))
    fn_one = lambda: f1out(q)  # noqa: E731
    results["out1_packed"] = timed("1 packed output", lambda: f1out(q))

    # --- per-block device_get vs deferred ---
    fn_one = lambda: f2out(q)  # noqa: E731
    results["out2_get_per_block"] = timed(
        "2 outputs, get per block", lambda: f2out(q), per_block_get=True
    )

    # --- queue depth ---
    fn_one = lambda: f13(q, *ops)  # noqa: E731
    results["args13_depth32"] = timed(
        "13 args, depth 32", lambda: f13(q, *ops), n=32
    )
    results["args13_depth4"] = timed(
        "13 args, depth 4", lambda: f13(q, *ops), n=4
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
