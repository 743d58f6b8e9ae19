"""w4h_etl_container_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL container ``jarataraj/w4h-etl-container``
(see SURVEY.md), extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §1.3/§4):

* long/tidy relational model — one row per (key..., ts) cell, one column per
  variable; the relational dual of the reference's labeled-ndarray model;
* declarative DataFrame/SQL plans — Catalyst does pruning/pushdown/broadcast;
* JVM-side expressions everywhere the math allows (the thermal-comfort
  kernels are pure arithmetic → native Column trees, whole-stage codegen);
  Arrow-vectorized pandas UDFs only as a parity/alternative surface;
* every operator designed for 100 TB: partition-pruned scans, broadcast
  small dims, map-side partial aggregation, AQE for skew.
"""

__version__ = "0.1.0"

from w4h_etl_container_spark.session import get_spark  # noqa: F401
