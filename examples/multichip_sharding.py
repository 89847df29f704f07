"""Multi-chip sharded search demo.

Runs on real devices when several are attached, or on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_sharding.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from rabitq_tpu import IvfRabitqIndex, Metric, SearchParams
from rabitq_tpu.parallel import sharding as sh


def main():
    n_dev = len(jax.devices())
    print(f"{n_dev} device(s): {jax.devices()[:4]}{'...' if n_dev > 4 else ''}")
    rng = np.random.default_rng(0)
    data = rng.standard_normal((4096, 64)).astype(np.float32)
    index = IvfRabitqIndex.train(data, nlist=32, total_bits=7, seed=1)
    dev = index.device

    mesh = sh.make_mesh(n_dev)
    row_arrays = sh.shard_rows(
        mesh,
        *(
            np.asarray(x)
            for x in (
                dev.binary, dev.ex, dev.f_add, dev.f_rescale, dev.f_error,
                dev.f_add_ex, dev.f_rescale_ex, dev.cluster_of, dev.valid, dev.ids,
            )
        ),
    )
    queries = data[:8]
    q_rot = np.asarray(index._rotate_jit(jnp.asarray(queries)))
    q_rep, c_rep = sh.replicate(mesh, q_rot, np.asarray(dev.centroids))

    ids, dists = sh.sharded_scan(
        q_rep, c_rep, *row_arrays,
        mesh=mesh, top_k=10, nprobe=32, rerank=400,
        metric=Metric.L2, ex_bits=index.ex_bits, scan_dtype="bf16",
    )
    ref = index.batch_search_arrays(queries, SearchParams(10, 32))
    print("sharded row 0:", np.asarray(ids)[0].tolist())
    print("single  row 0:", ref[0][0].tolist())


if __name__ == "__main__":
    main()
