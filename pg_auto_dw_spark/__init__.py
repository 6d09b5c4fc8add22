"""pg_auto_dw_spark: a PySpark-native rebuild of tembo-io/pg_auto_dw.

Automates construction + incremental loading of a Data Vault 2.0 raw
vault over Spark tables, re-expressed Spark-first (DataFrame/SQL +
Catalyst), plus the large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB deployment needs.
"""

__version__ = "0.1.0"
