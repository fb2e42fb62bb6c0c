"""Flax module library (layers L2-L3). All modules use [B, T, C]
(channels-last) layout — the native layout for XLA:TPU convolutions — in
contrast to the reference's torch [B, C, T] with transposes everywhere."""
