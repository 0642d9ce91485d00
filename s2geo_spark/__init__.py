"""s2geo_spark — a from-scratch PySpark-native spherical-geometry and
spatial-join engine with the query capabilities of the reference S2 fork
(xiaoruirui123789/s2geo), re-expressed Spark-first:

  * kernel/    pure-NumPy bit-exact cell-id + transform kernels
  * functions/ DataFrame-level column functions and pandas UDFs
  * operators/ joins (PIP, kNN, distance), coverings, dedup, similarity
  * sources/   deterministic synthetic pages table + geo derivations
  * plans/     density/skew planner, manifest/checkpoint loop
  * streaming/ structured-streaming tile assignment
"""

__version__ = "0.1.0"
