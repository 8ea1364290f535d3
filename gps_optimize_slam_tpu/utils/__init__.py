"""Utilities: logging, profiling, test helpers."""
