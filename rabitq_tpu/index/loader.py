"""Smart index loader — magic-based dispatch.

Mirrors the reference ``RabitqIndex`` enum (lqhl/rabitq-rs
``src/index.rs:36-198``): peek the 4-byte magic, dispatch ``RBQ1`` to the
IVF loader and ``RBF1`` to the brute-force loader, reject anything else.

Note: the reference's own quantizer allocates ``dim/16*2`` zero bytes of
ex-code even for total_bits=1 (``quantizer.rs:213``) but its brute-force
*loader* expects zero bytes in that case (``brute_force.rs:465-469``) — a
write/read inconsistency for 1-bit BF indices. We implement the loader-side
semantics (no ex bytes when ex_bits == 0) on both paths, which the
reference loader accepts.
"""

from __future__ import annotations

from ..errors import InvalidPersistence
from .brute_force import BruteForceRabitqIndex
from .ivf import IvfRabitqIndex


class RabitqIndex:
    """Unified wrapper over either index kind (``index.rs:36-69``)."""

    def __init__(self, inner):
        self.inner = inner

    @property
    def kind(self) -> str:
        return "ivf" if isinstance(self.inner, IvfRabitqIndex) else "brute_force"

    @property
    def is_ivf(self) -> bool:
        return self.kind == "ivf"

    @property
    def is_brute_force(self) -> bool:
        return self.kind == "brute_force"

    def as_ivf(self) -> IvfRabitqIndex:
        if not self.is_ivf:
            raise TypeError("index is not an IVF index")
        return self.inner

    def as_brute_force(self) -> BruteForceRabitqIndex:
        if not self.is_brute_force:
            raise TypeError("index is not a brute-force index")
        return self.inner

    def __len__(self) -> int:
        return len(self.inner)

    def __getattr__(self, name):
        return getattr(self.inner, name)

    @classmethod
    def load_from_path(cls, path, scan_dtype: str = "bf16") -> "RabitqIndex":
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic == b"RBQ1":
            return cls(IvfRabitqIndex.load_from_path(path, scan_dtype=scan_dtype))
        if magic == b"RBF1":
            return cls(BruteForceRabitqIndex.load_from_path(path, scan_dtype=scan_dtype))
        raise InvalidPersistence("unrecognized file header")


def load_index(path, scan_dtype: str = "bf16") -> RabitqIndex:
    """Convenience function mirroring ``RabitqIndex::load_from_path``."""
    return RabitqIndex.load_from_path(path, scan_dtype=scan_dtype)
