"""s2geometry_d_spark — PySpark-native S2 spatial-join + tiling engine.

From-scratch engine with the query capabilities of the S2 geometry library
(reference study: vnayar/s2geometry-d, see SURVEY.md).  Spark-first design:
DataFrame/SQL plans + vectorized Arrow/pandas UDF kernels; no per-row Python.
"""

__version__ = "0.1.0"
