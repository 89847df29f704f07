"""Package the persistent XLA compile cache into the committed seed tarball.

Run this AFTER a session that compiled the heavy programs (a full
``bench.py`` run covers the fused 1M scan, k-means, quantize, groundtruth
and MSTG programs). The tarball is committed under ``cache_seed/`` so a
fresh worker's first build skips the 280-330 s remote compiles
(``utils/compile_cache.seed_cache`` unpacks it on
``enable_compilation_cache``).

Usage: python tools/make_cache_seed.py [--max-mb 80]
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rabitq_tpu.utils.compile_cache import _default_dir, _seed_tarball  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-mb", type=float, default=80.0,
                    help="refuse to write a tarball larger than this")
    args = ap.parse_args()
    cache_dir = _default_dir()
    entries = sorted(p for p in cache_dir.iterdir() if p.is_file())
    if not entries:
        print(f"no cache entries in {cache_dir}", file=sys.stderr)
        return 1
    out = _seed_tarball()
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".tmp")
    with tarfile.open(tmp, "w:gz") as tf:
        for p in entries:
            tf.add(p, arcname=p.name)
    size_mb = tmp.stat().st_size / 1e6
    if size_mb > args.max_mb:
        tmp.unlink()
        print(f"seed would be {size_mb:.1f} MB > --max-mb; aborting", file=sys.stderr)
        return 1
    tmp.replace(out)
    print(f"wrote {out} ({size_mb:.1f} MB, {len(entries)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
