"""Data pipeline (layer L5): packed dataset IO, binarizers, batching."""
