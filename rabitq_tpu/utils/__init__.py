"""Utilities: logging, timing."""
