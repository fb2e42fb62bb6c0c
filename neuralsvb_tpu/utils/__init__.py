"""Shared host-side utilities (layer L1): text encoding, plotting,
profiling, metrics."""
