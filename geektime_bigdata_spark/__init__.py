"""geektime_bigdata_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of every query / data-processing
capability exercised by the reference repo ``lxl910128/geektime-bigdata``
(Hadoop MapReduce traffic aggregation, HBase prefix scans, Spark RDD
inverted indexes, Catalyst plan introspection), re-expressed Spark-first
(DataFrame / SQL / Structured Streaming), plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB corpus engine needs.

Design stance (see SURVEY.md §7.0):
- Declarative DataFrame plans; Catalyst/Tungsten pick physical strategy.
- Built-in ``pyspark.sql.functions`` in every hot path; Arrow-vectorized
  pandas UDFs only where no native expression exists.
- Every operator is a pure ``(spark, sf_dir) -> DataFrame`` function with a
  DuckDB-oracle SQL twin registered in ``__spark_entry__.py``.
"""

from geektime_bigdata_spark.session import get_spark
from geektime_bigdata_spark.registry import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
