"""I/O: dataset readers and reference-compatible persistence."""
