"""Compile-cache seed tarball round trip (utils/compile_cache.seed_cache)."""

import tarfile

from rabitq_tpu.utils import compile_cache


def test_seed_cache_extracts_missing_only(tmp_path, monkeypatch):
    src = tmp_path / "src"
    src.mkdir()
    (src / "entry_a").write_bytes(b"AAA")
    (src / "entry_b").write_bytes(b"BBB")
    tar = tmp_path / "seed.tar.gz"
    with tarfile.open(tar, "w:gz") as tf:
        for p in sorted(src.iterdir()):
            tf.add(p, arcname=p.name)
    monkeypatch.setattr(compile_cache, "_seed_tarball", lambda: tar)

    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "entry_a").write_bytes(b"NEWER")  # must not be clobbered
    n = compile_cache.seed_cache(cache)
    assert n == 1
    assert (cache / "entry_a").read_bytes() == b"NEWER"
    assert (cache / "entry_b").read_bytes() == b"BBB"
    # idempotent
    assert compile_cache.seed_cache(cache) == 0


def test_seed_cache_missing_tarball(tmp_path, monkeypatch):
    monkeypatch.setattr(
        compile_cache, "_seed_tarball", lambda: tmp_path / "absent.tar.gz"
    )
    assert compile_cache.seed_cache(tmp_path) == 0
