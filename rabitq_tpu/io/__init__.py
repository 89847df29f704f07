"""I/O: dataset readers and reference-compatible persistence."""

from .vecio import read_fvecs, read_groundtruth, read_ids, read_ivecs, write_fvecs, write_ivecs

__all__ = [
    "read_fvecs",
    "read_ivecs",
    "read_ids",
    "read_groundtruth",
    "write_fvecs",
    "write_ivecs",
]
