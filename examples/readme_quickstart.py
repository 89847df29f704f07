"""README quickstart — parity with the reference example
(``examples/readme_quickstart.rs``): 10K x 128 random vectors, nlist=256,
7-bit, FhtKac rotation, nprobe=32 top-10."""

import numpy as np

from rabitq_tpu import IvfRabitqIndex, Metric, RotatorType, SearchParams


def main():
    rng = np.random.default_rng(42)
    dim = 128
    dataset = rng.random((10_000, dim), dtype=np.float32)

    index = IvfRabitqIndex.train(
        dataset,
        nlist=256,
        total_bits=7,  # 1 sign + 6 magnitude
        metric=Metric.L2,
        rotator_type=RotatorType.FhtKacRotator,
        seed=42,
    )

    params = SearchParams(top_k=10, nprobe=32)
    results = index.search(dataset[0], params)
    print(f"Top neighbor ID: {results[0].id}, distance: {results[0].score}")


if __name__ == "__main__":
    main()
