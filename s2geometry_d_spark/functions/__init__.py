"""Spark-facing function layer: vectorized Arrow/pandas UDF kernels and
native Catalyst column expressions for S2 cell math."""
