"""Compile-cache seed tarball round trip (utils/compile_cache.seed_cache)
and the regenerating packer (tools/make_cache_seed.py)."""

import importlib.util
import os
import tarfile

from rabitq_tpu.utils import compile_cache


def _load_packer():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "make_cache_seed.py",
    )
    spec = importlib.util.spec_from_file_location("make_cache_seed", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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


def test_make_cache_seed_deterministic_and_pruned(tmp_path, monkeypatch):
    """The packer must (a) emit byte-identical tarballs for unchanged cache
    content — so the committed blob doesn't churn per round — and (b) prune
    oldest-first to the size budget instead of accreting."""
    packer = _load_packer()
    cache = tmp_path / "jax_cache"
    cache.mkdir()
    old = cache / "entry_old"
    old.write_bytes(b"O" * 600)
    os.utime(old, (1_000, 1_000))  # stale: should be pruned first
    for i, ts in ((0, 2_000), (1, 3_000)):
        p = cache / f"entry_new{i}"
        p.write_bytes(bytes([65 + i]) * 400)
        os.utime(p, (ts, ts))
    out = tmp_path / "seed" / "jax_cache_seed.tar.gz"
    monkeypatch.setattr(packer, "_default_dir", lambda: cache)
    monkeypatch.setattr(packer, "_seed_tarball", lambda: out)

    # budget fits both new entries (800 B) but not old+new (1400 B)
    monkeypatch.setattr(
        "sys.argv", ["make_cache_seed.py", "--max-mb", str(1000 / 1e6)]
    )
    assert packer.main() == 0
    first = out.read_bytes()
    with tarfile.open(out, "r:gz") as tf:
        names = sorted(tf.getnames())
    assert names == ["entry_new0", "entry_new1"]

    # unchanged cache -> byte-identical output (and reported as unchanged)
    assert packer.main() == 0
    assert out.read_bytes() == first

    # the emitted seed round-trips through seed_cache
    monkeypatch.setattr(compile_cache, "_seed_tarball", lambda: out)
    dest = tmp_path / "fresh"
    dest.mkdir()
    assert compile_cache.seed_cache(dest) == 2
    assert (dest / "entry_new1").read_bytes() == b"B" * 400
