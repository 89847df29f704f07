"""MSTG quickstart — parity with ``examples/mstg_quickstart.rs``."""

import numpy as np

from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams


def main():
    rng = np.random.default_rng(7)
    data = rng.standard_normal((20_000, 96)).astype(np.float32)

    config = MstgConfig(
        max_posting_size=2000,
        branching_factor=8,
        rabitq_bits=7,
        faster_config=True,
    )
    index = MstgIndex.build(data, config)
    print(
        f"built: {len(index)} vectors, {index.posting_list_count()} posting "
        f"lists, replication {index.replication_factor():.2f}, "
        f"~{index.memory_usage() / 1e6:.1f} MB"
    )

    for preset in ("low_latency", "balanced", "high_recall"):
        params = getattr(MstgSearchParams, preset)(10)
        hits = index.search(data[0], params)
        print(preset, "->", [(h.id, round(h.score, 3)) for h in hits[:3]])


if __name__ == "__main__":
    main()
