"""Scalar/vectorized function library (hashing, URLs, text)."""
