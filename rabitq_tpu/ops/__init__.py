"""Compute ops: rotation, quantization, estimator, k-means, packing."""
