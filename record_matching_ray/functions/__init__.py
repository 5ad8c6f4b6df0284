"""Vectorized scalar/batch kernels shared by the pipeline stages."""
