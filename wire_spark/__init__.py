"""wire_spark — a PySpark-native analytics & stream-processing engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference stream-processing framework (tarungka/wire): streaming ETL
pipelines (source -> transform -> sink), a replicated-KV query dialect
(SET/GET/DELETE), and the declared-intent operator set (windows,
joins, SQL, materialized views) — plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed
for 100 TB scale.

Design stance (see SURVEY.md §7): DataFrame/SQL first, Catalyst does
the optimizing, Structured Streaming does the streaming, Pandas UDFs
only where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from wire_spark.engine import get_spark, load_tables, TABLES  # noqa: F401
