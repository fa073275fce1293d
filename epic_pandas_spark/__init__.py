"""epic_pandas_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Cybereason/epic-pandas.

Not a port: the reference (pure-Python pandas utility layer, see
/root/reference/README.md:4-20) defines WHAT is computed; this package
re-expresses each capability as composite operators over the lazy
pyspark.sql DataFrame API so Catalyst/Tungsten choose the physical plan.

Layout:
  session     — SparkSession factory tuned for local[N] and cluster use
  keyed       — keyed-frame convention (pandas index -> explicit key cols)
  sources/    — polymorphic load/dump, iterable ingestion
  operators/  — relational composite operators (value_counts, upsert, ...)
  functions/  — column-level expression builders (entropy, text, vectors)
  extensions/ — LLM-data-pipeline tier: dedup, similarity, multimodal
  plans/      — headline analytical queries (TPC-H-style)
  streaming/  — Structured Streaming variants of the batch operators
"""

from epic_pandas_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
