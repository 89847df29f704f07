"""Package the persistent XLA compile cache into the committed seed tarball.

Run this AFTER a session that compiled the heavy programs (a full
``bench.py`` run covers the fused 1M scan, k-means, quantize, groundtruth
and MSTG programs). The tarball is committed under ``cache_seed/`` so a
fresh worker's first build skips the 280-330 s remote compiles
(``utils/compile_cache.seed_cache`` unpacks it on
``enable_compilation_cache``).

The seed is REGENERATED, not accreted: entries are taken newest-first
(by mtime) until the ``--max-mb`` budget is filled, so stale executables
from superseded program shapes age out instead of growing the blob. The
tarball itself is deterministic (sorted members, zeroed timestamps/owner,
gzip mtime=0): re-running over an unchanged cache reproduces the committed
file byte-for-byte, so git history only grows when the cache content
actually changed.

Usage: python tools/make_cache_seed.py [--max-mb 80]
"""

from __future__ import annotations

import argparse
import gzip
import io
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rabitq_tpu.utils.compile_cache import _default_dir, _seed_tarball  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-mb", type=float, default=80.0,
                    help="budget: pack newest entries until this many MB of "
                         "(uncompressed) cache is included")
    args = ap.parse_args()
    cache_dir = _default_dir()
    entries = [p for p in cache_dir.iterdir() if p.is_file()]
    if not entries:
        print(f"no cache entries in {cache_dir}", file=sys.stderr)
        return 1

    # Newest-first pruning: executables compiled by the current code are
    # the ones worth shipping; old shapes age out of the seed.
    entries.sort(key=lambda p: p.stat().st_mtime, reverse=True)
    budget = args.max_mb * 1e6
    kept, used = [], 0.0
    for p in entries:
        sz = p.stat().st_size
        if used + sz > budget and kept:
            continue
        kept.append(p)
        used += sz
    skipped = len(entries) - len(kept)

    # Deterministic archive: stable member order, zeroed metadata, gzip
    # header without mtime — identical cache content => identical bytes.
    kept.sort(key=lambda p: p.name)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as tf:
        for p in kept:
            info = tarfile.TarInfo(name=p.name)
            data = p.read_bytes()
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    payload = gzip.compress(buf.getvalue(), compresslevel=9, mtime=0)

    out = _seed_tarball()
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists() and out.read_bytes() == payload:
        print(f"{out} unchanged ({len(payload) / 1e6:.1f} MB, "
              f"{len(kept)} entries, {skipped} pruned)")
        return 0
    tmp = out.with_suffix(".tmp")
    tmp.write_bytes(payload)
    tmp.replace(out)
    print(f"wrote {out} ({len(payload) / 1e6:.1f} MB, {len(kept)} entries, "
          f"{skipped} pruned by --max-mb)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
