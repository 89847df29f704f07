"""MSTG hierarchical index (SPANN-style)."""
