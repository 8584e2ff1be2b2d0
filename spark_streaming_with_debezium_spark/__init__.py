"""PySpark-native analytics + CDC engine.

A from-scratch engine with the query and data-processing capabilities of
the reference CDC pipeline (sulfur1c/spark-streaming-with-debezium):
Debezium envelope parsing, last-write-wins compaction, join-based MERGE,
the delegated relational/analytic SQL surface, structured-streaming
operators, and large-scale LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, whole-stage codegen kept intact (no driver-side row loops —
the reference's `DebeziumDeltaFormatter.scala:14-26` anti-pattern is
deliberately NOT replicated), Pandas UDFs only where built-ins cannot
express the semantics.
"""

from spark_streaming_with_debezium_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
