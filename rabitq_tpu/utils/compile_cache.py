"""Persistent XLA compilation cache for the heavy tunnel compiles.

The remote-compile tunnel makes first-time jit costly (~10-120 s per
shape; the fused 1M kernel ~280-330 s, see CLAUDE.md). JAX's persistent
compilation cache serializes the compiled executable to disk keyed by the
program hash, so a FRESH PROCESS re-running the same program skips the
remote compile entirely (measured: a cold 2048x2048 matmul program drops
0.94 s -> 0.07 s through the tunnel; the win scales with compile time).

Opt-in per entry point (``bench.py``, the CLI, ``__graft_entry__``) via
:func:`enable_compilation_cache` rather than on package import — a
library should not mutate process-global jax config as an import side
effect. Controlled by env vars:

- ``RABITQ_TPU_COMPILE_CACHE`` — set to ``0`` to disable.
- ``RABITQ_TPU_COMPILE_CACHE_DIR`` — cache directory (default
  ``data/jax_cache`` under the repo root when writable, else
  ``~/.cache/rabitq_tpu/jax``).

Only programs whose compile took >= 2 s are cached (tiny programs would
bloat the cache for no benefit; every heavyweight program — fused scans,
k-means builds, sharded pipelines — clears the bar through the tunnel).
Cache misses and deserialization failures fall back to a normal compile,
so a stale cache can cost nothing worse than the status quo.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def _seed_tarball() -> Path:
    repo = Path(__file__).resolve().parents[2]
    return repo / "cache_seed" / "jax_cache_seed.tar.gz"


def seed_cache(cache_dir: Path) -> int:
    """Unpack the committed cache-seed tarball into ``cache_dir``.

    Worker resets wipe ``data/`` (CLAUDE.md), so the round-3 artifact paid
    every heavy compile cold (932.9 s build). The seed tarball lives in
    git (`cache_seed/`, built by ``tools/make_cache_seed.py``) and holds
    the serialized executables of the heavyweight programs (fused 1M scan,
    k-means, quantize). Members already present are skipped; a stale seed
    (different jax build) simply misses and falls back to a normal
    compile. Returns the number of entries extracted.
    """
    tar = _seed_tarball()
    if not tar.exists():
        return 0
    import tarfile

    extracted = 0
    try:
        with tarfile.open(tar, "r:gz") as tf:
            for member in tf.getmembers():
                if not member.isfile():
                    continue
                dest = cache_dir / Path(member.name).name
                if dest.exists():
                    continue
                src = tf.extractfile(member)
                if src is None:
                    continue
                dest.write_bytes(src.read())
                extracted += 1
    except (OSError, tarfile.TarError):
        return extracted  # partial seed is still a valid cache
    return extracted


def _default_dir() -> Path:
    env = os.environ.get("RABITQ_TPU_COMPILE_CACHE_DIR")
    if env:
        return Path(env)
    repo = Path(__file__).resolve().parents[2]
    candidate = repo / "data" / "jax_cache"
    try:
        candidate.mkdir(parents=True, exist_ok=True)
        return candidate
    except OSError:
        return Path.home() / ".cache" / "rabitq_tpu" / "jax"


def enable_compilation_cache(path: str | os.PathLike | None = None) -> str | None:
    """Enable the persistent compilation cache (idempotent).

    Returns the cache directory in use, or None when disabled via
    ``RABITQ_TPU_COMPILE_CACHE=0`` or when jax rejects the config.
    """
    global _ENABLED
    if os.environ.get("RABITQ_TPU_COMPILE_CACHE", "1") == "0":
        return None
    import jax

    cache_dir = Path(path) if path is not None else _default_dir()
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        n = seed_cache(cache_dir)
        if n:
            import logging

            logging.getLogger("rabitq_tpu.compile_cache").info(
                "seeded %d compile-cache entries from %s", n, _seed_tarball()
            )
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (OSError, AttributeError, ValueError):
        return None  # read-only fs or an old jax: run uncached
    _ENABLED = True
    return str(cache_dir)
