"""Microbenchmark the survivor re-rank (stage 2) in isolation.

Stage 2 gathers each query's ``rerank`` candidate code rows from the
[N, Dpad] int8 total plane and dots them against the query
(``index/scan.py::_stage2_rerank``). At the 1M headline point this is
the largest remaining slice of the device batch, so this probe times
the gather/dot variants with DEVICE-GENERATED data (no big uploads, no
Pallas compiles — iterate in seconds, not minutes):

  * gather+einsum (the production path, bf16 operands)
  * gather only (isolates the HBM gather from the dot)
  * einsum on a pre-gathered buffer (isolates the dot)
  * sorted candidate indices (does gather locality matter?)
  * int8 dot (operand-conversion traffic share)
  * smaller rerank values (sensitivity)

NOTE: every jitted function takes the big planes as ARGUMENTS. Closing
over a ~1 GB device array embeds it as a compile-time constant, and the
remote-compile tunnel then ships (and tries to fold) the constant —
minutes-per-program compiles.

Usage: python tools/stage2_micro.py [--rows 1000000] [--batch 512]
"""

from __future__ import annotations

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=960)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--rerank", type=int, default=400)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    d_pad = ((args.dim + 63) // 64) * 64
    n_pad = ((args.rows + 511) // 512) * 512
    b, r = args.batch, args.rerank

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    t0 = time.time()
    ex = jax.random.randint(ks[0], (n_pad, d_pad), 0, 128, jnp.int8)
    jax.block_until_ready(ex)
    log(f"ex plane [{n_pad}, {d_pad}] generated on device: {time.time()-t0:.1f}s")
    q = jax.random.normal(ks[1], (b, d_pad), jnp.float32)
    f_add_ex = jax.random.normal(ks[2], (n_pad,))
    f_rescale_ex = jax.random.normal(ks[3], (n_pad,))
    g_add_c = jax.random.normal(ks[4], (b, r))
    # candidate rows drawn the way the fused scan produces them: each
    # query's candidates fall inside ~nprobe contiguous cluster spans
    rows_per_cluster = n_pad // args.nlist
    cl = jax.random.randint(ks[5], (b, args.nprobe), 0, args.nlist)
    base = (cl * rows_per_cluster)[:, :, None]
    off = jax.random.randint(
        ks[6], (b, args.nprobe, (r + args.nprobe - 1) // args.nprobe),
        0, rows_per_cluster,
    )
    cand_clustered = (base + off).reshape(b, -1)[:, :r].astype(jnp.int32)
    cand_uniform = jax.random.randint(ks[7], (b, r), 0, n_pad, jnp.int32)
    jax.block_until_ready((q, cand_clustered, cand_uniform))
    log("inputs ready")

    def timeit(name, fn, *xs):
        t0 = time.time()
        jax.block_until_ready(fn(*xs))  # compile
        log(f"{name:>28}: compiled in {time.time()-t0:.1f}s")
        t0 = time.time()
        outs = [fn(*xs) for _ in range(args.reps)]
        jax.block_until_ready(outs)
        ms = (time.time() - t0) / args.reps * 1000
        log(f"{name:>28}: {ms:8.3f} ms")
        return ms

    @jax.jit
    def production(ex, q, f_add_ex, f_rescale_ex, g_add_c, cand):
        t_cand = jnp.take(ex, cand, axis=0)  # [B, R, D]
        tdot = jnp.einsum(
            "brd,bd->br", t_cand.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        dist = f_add_ex[cand] + g_add_c[:, : cand.shape[1]] + (
            f_rescale_ex[cand] * tdot
        )
        neg, pos = jax.lax.top_k(-dist, 10)
        return pos

    @jax.jit
    def gather_only(ex, cand):
        t_cand = jnp.take(ex, cand, axis=0)
        return jnp.sum(t_cand.astype(jnp.int32), axis=(1, 2))

    @jax.jit
    def dot_only(t_cand, q):
        return jnp.einsum(
            "brd,bd->br", t_cand.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def production_sorted(ex, q, f_add_ex, f_rescale_ex, g_add_c, cand):
        return production(ex, q, f_add_ex, f_rescale_ex, g_add_c,
                          jnp.sort(cand, axis=1))

    @jax.jit
    def int8_dot(ex, q, cand):
        t_cand = jnp.take(ex, cand, axis=0)
        scale = jnp.max(jnp.abs(q), axis=-1, keepdims=True) / 127.0
        q8 = jnp.clip(jnp.round(q / scale), -127, 127).astype(jnp.int8)
        return jnp.einsum(
            "brd,bd->br", t_cand, q8, preferred_element_type=jnp.int32
        )

    res = {}
    res["production_clustered"] = timeit(
        "production (clustered idx)", production,
        ex, q, f_add_ex, f_rescale_ex, g_add_c, cand_clustered,
    )
    res["production_uniform"] = timeit(
        "production (uniform idx)", production,
        ex, q, f_add_ex, f_rescale_ex, g_add_c, cand_uniform,
    )
    res["gather_only"] = timeit("gather only", gather_only, ex, cand_clustered)
    pre = jnp.take(ex, cand_clustered, axis=0)
    jax.block_until_ready(pre)
    res["dot_only"] = timeit("dot only (pre-gathered)", dot_only, pre, q)
    res["production_sorted"] = timeit(
        "production (sorted idx)", production_sorted,
        ex, q, f_add_ex, f_rescale_ex, g_add_c, cand_clustered,
    )
    res["int8_dot"] = timeit(
        "gather + int8 dot", int8_dot, ex, q, cand_clustered
    )
    for rr in (200, 100):
        res[f"production_r{rr}"] = timeit(
            f"production (rerank={rr})", production,
            ex, q, f_add_ex, f_rescale_ex, g_add_c, cand_clustered[:, :rr],
        )

    print(res)


if __name__ == "__main__":
    main()
