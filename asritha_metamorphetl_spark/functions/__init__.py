"""Scalar/aggregate function library: numeric, text, vector, hashing."""
