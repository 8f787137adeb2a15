"""quack_reduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
BauplanLabs/quack-reduce (a stateless serverless DuckDB-over-S3 query
engine, see /root/reference) on Apache Spark:

- stateless SQL over a Parquet data lake (reference ``app.py:51``)
  → ``Engine.sql`` over path-registered temp views;
- hive-partitioned scans with pruning (reference ``benchmark.py:45,138,237``)
  → Spark partition discovery + Catalyst partition pruning;
- manual map-reduce fan-out (reference ``benchmark.py:185-240``)
  → Spark's native partial/final HashAggregate physical plan;
- result-size governance + metadata envelope (reference ``app.py:54,70-85``)
  → ``Engine.sql(query, limit)`` returning ``{metadata, data}``.

Beyond the reference: LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) and batch/streaming time
windows, all designed for 100 TB scale (declarative plans, no driver
side loops, broadcastable dims, AQE on).
"""

from quack_reduce_spark.engine import Engine
from quack_reduce_spark.session import get_spark

__all__ = ["Engine", "get_spark"]

__version__ = "0.1.0"
