"""Scalar function library: pure-Python cores + vectorized Spark bindings."""
