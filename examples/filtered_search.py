"""Filtered search — parity with ``examples/filtered_search.rs``: restrict
results to an allowed-id set (the reference uses a RoaringBitmap; here any
integer array or boolean mask works)."""

import numpy as np

from rabitq_tpu import IvfRabitqIndex, SearchParams


def main():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((5_000, 64)).astype(np.float32)
    index = IvfRabitqIndex.train(data, nlist=64, total_bits=7, seed=3)
    params = SearchParams(top_k=10, nprobe=16)

    everything = index.search(data[0], params)
    even_only = index.search_filtered(data[0], params, np.arange(0, 5_000, 2))
    print("unfiltered:", [h.id for h in everything[:5]])
    print("even ids:  ", [h.id for h in even_only[:5]])
    assert all(h.id % 2 == 0 for h in even_only)


if __name__ == "__main__":
    main()
