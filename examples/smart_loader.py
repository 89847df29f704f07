"""Smart loader — parity with ``examples/smart_loader.rs``: one entry point
that detects the on-disk index kind from its magic bytes."""

import tempfile
import os

import numpy as np

from rabitq_tpu import (
    BruteForceRabitqIndex,
    BruteForceSearchParams,
    IvfRabitqIndex,
    SearchParams,
    load_index,
)


def main():
    rng = np.random.default_rng(11)
    data = rng.standard_normal((2_000, 48)).astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        p_ivf = os.path.join(td, "a.index")
        p_bf = os.path.join(td, "b.index")
        IvfRabitqIndex.train(data, nlist=16, total_bits=7, seed=1).save_to_path(p_ivf)
        BruteForceRabitqIndex.train(data, total_bits=7, seed=1).save_to_path(p_bf)

        for path in (p_ivf, p_bf):
            idx = load_index(path)
            print(path, "->", idx.kind, len(idx), "vectors")
            if idx.is_ivf:
                hits = idx.search(data[0], SearchParams(5, 16))
            else:
                hits = idx.search(data[0], BruteForceSearchParams(5))
            print("   top:", [h.id for h in hits])


if __name__ == "__main__":
    main()
