"""MSTG hierarchical index (SPANN-style), TPU-native."""

from .config import MstgConfig, MstgSearchParams, ScalarPrecision
from .index import MstgIndex

__all__ = ["MstgConfig", "MstgSearchParams", "ScalarPrecision", "MstgIndex"]
