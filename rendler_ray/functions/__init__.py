"""Scalar / batch kernels: URL canonicalization, text analysis, ANN, media."""
