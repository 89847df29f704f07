"""Mini benchmark — parity with ``examples/benchmark_mini.rs``: tiny
end-to-end flow with recall measurement against exact search."""

import numpy as np

from rabitq_tpu import IvfRabitqIndex, SearchParams


def main():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((5_000, 64)).astype(np.float32)
    queries = rng.standard_normal((32, 64)).astype(np.float32)
    index = IvfRabitqIndex.train(data, nlist=64, total_bits=7, seed=0)

    d2 = ((data[None, :, :] - queries[:, None, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    for nprobe in (2, 8, 32):
        ids, _ = index.batch_search_arrays(queries, SearchParams(10, nprobe))
        rec = np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(32)])
        print(f"nprobe={nprobe:2d} recall@10={rec:.3f}")


if __name__ == "__main__":
    main()
