"""Plot recall/QPS sweep CSVs (the schema written by
``python -m rabitq_tpu sweep`` and by the reference's
``benchmarks/gist_1m_results/recall_qps_fixed.csv``).

Usage: python tools/plot_recall_qps.py sweep.csv [out.png]
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict


def load(path):
    series = defaultdict(list)
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        for row in reader:
            if len(row) < 5:
                continue
            method, config, recall, latency, qps = row[:5]
            series[method].append((float(recall), float(qps), config))
    for pts in series.values():
        pts.sort()
    return series


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    series = load(sys.argv[1])
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        for method, pts in series.items():
            ax.plot([p[0] for p in pts], [p[1] for p in pts], "o-", label=method)
        ax.set_xlabel("recall")
        ax.set_ylabel("QPS")
        ax.set_yscale("log")
        ax.legend()
        ax.grid(True, alpha=0.3)
        out = sys.argv[2] if len(sys.argv) > 2 else "recall_qps.png"
        fig.savefig(out, dpi=130, bbox_inches="tight")
        print(f"wrote {out}")
    except ImportError:
        # text fallback (matplotlib is not baked into every image)
        for method, pts in series.items():
            print(f"\n{method}:")
            for recall, qps, config in pts:
                bar = "#" * max(1, int(recall * 50))
                print(f"  {config:>24s} recall={recall:.3f} qps={qps:9.1f} {bar}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
