"""rabitq_tpu — a TPU-native RaBitQ vector index and query engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lqhl/rabitq-rs (RaBitQ quantization, IVF and brute-force indices, the MSTG
hierarchical index, reference-compatible persistence, fvecs/ivecs I/O and
Python/CLI surfaces), built for TPU hardware: code planes in HBM scanned by
MXU matmuls, batched static-shaped search programs, and device-mesh
sharding for multi-chip scale.
"""

from .errors import (
    DimensionMismatch,
    EmptyIndex,
    InvalidConfig,
    InvalidPersistence,
    IoError,
    RabitqError,
)
from .types import Metric, RotatorType, SearchParams, SearchResult
from .index.ivf import IvfRabitqIndex
from .index.brute_force import BruteForceRabitqIndex, BruteForceSearchParams
from .index.loader import RabitqIndex, load_index
from .index.streaming import StreamedIvfIndex
from .index.mstg import MstgConfig, MstgIndex, MstgSearchParams, ScalarPrecision

__version__ = "0.1.0"

__all__ = [
    "Metric",
    "RotatorType",
    "SearchParams",
    "SearchResult",
    "IvfRabitqIndex",
    "BruteForceRabitqIndex",
    "BruteForceSearchParams",
    "RabitqIndex",
    "load_index",
    "StreamedIvfIndex",
    "MstgConfig",
    "MstgIndex",
    "MstgSearchParams",
    "ScalarPrecision",
    "RabitqError",
    "DimensionMismatch",
    "InvalidConfig",
    "EmptyIndex",
    "IoError",
    "InvalidPersistence",
]
