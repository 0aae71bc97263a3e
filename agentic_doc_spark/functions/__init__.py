"""Scalar / vectorized kernels (SURVEY.md §2.7, §2.8, north-rule additions)."""
