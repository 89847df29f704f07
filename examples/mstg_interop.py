"""MSTG format interop + centroid scalar precision.

Demonstrates the two round-3 MSTG capabilities:

* ``save_to_path(format="reference")`` writes the reference's bincode v1
  ``.mstg`` body (lqhl/rabitq-rs ``mstg/io.rs:82-126``) so indexes built
  here can move to the reference (see PARITY.md for the hnsw side-file
  caveat), and reference-written files load transparently through
  ``MstgIndex.load_from_path``.
* ``MstgConfig.centroid_precision`` genuinely quantizes the stored
  centroids (bf16 round-to-nearest-even / fp16 / int8+scale,
  ``mstg/scalar_quant.rs`` parity): the rounded values drive the residual
  quantization, the centroid scoring and the persisted bytes.

Run: python examples/mstg_interop.py
"""

import os
import tempfile

import numpy as np

from rabitq_tpu import MstgConfig, MstgIndex, MstgSearchParams, ScalarPrecision


def main():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((10, 64)).astype(np.float32) * 4
    data = (
        centers[rng.integers(0, 10, 4000)]
        + 0.3 * rng.standard_normal((4000, 64))
    ).astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        # --- reference-format round trip ---
        cfg = MstgConfig(max_posting_size=512, faster_config=True)
        index = MstgIndex.build(data, cfg, seed=1)
        ref_path = os.path.join(td, "interop")
        index.save_to_path(ref_path, format="reference")
        size = os.path.getsize(ref_path + ".mstg")
        print(f"reference-format file: {ref_path}.mstg ({size/1e6:.1f} MB)")

        loaded = MstgIndex.load_from_path(ref_path + ".mstg")
        hits = loaded.search(data[0], MstgSearchParams(top_k=5, ef_search=16))
        print("loaded search:", [(h.id, round(h.score, 3)) for h in hits])

        # --- centroid precisions change bytes, not just accounting ---
        for prec in (ScalarPrecision.FP32, ScalarPrecision.BF16, ScalarPrecision.INT8):
            cfg_p = MstgConfig(
                max_posting_size=512, faster_config=True, centroid_precision=prec
            )
            idx_p = MstgIndex.build(data, cfg_p, seed=1)
            p = os.path.join(td, f"{prec.value}.mstg")
            idx_p.save_to_path(p)
            r = idx_p.search(data[1], MstgSearchParams(top_k=3, ef_search=16))
            print(
                f"{prec.value:>5}: file {os.path.getsize(p)/1e6:.2f} MB, "
                f"memory {idx_p.memory_usage()/1e6:.2f} MB, "
                f"top hit {r[0].id}"
            )


if __name__ == "__main__":
    main()
