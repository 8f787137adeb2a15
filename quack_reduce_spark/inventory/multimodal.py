"""Multimodal-column inventory (north-star component).

mm_binary_meta is fully oracle-checkable (byte length + sha256 of the
payload — both engines hash identical UTF-8 bytes). mm_decode_stub
exercises the Arrow-batched mapInPandas decode plumbing with a
deterministic fake codec → rows-only driver check + unit tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.multimodal import attach_binary_payload, decode_image_meta


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary payload column: size + sha256."""
    docs = attach_binary_payload(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode of binary payloads → image-meta rows
    (deterministic fake codec; rows-only driver check)."""
    docs = attach_binary_payload(load(spark, sf_dir, "documents"))
    return decode_image_meta(docs)


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_decode_stub": mm_decode_stub,
}


ORACLES = {
    "mm_binary_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               sha256(text) AS sha
        FROM documents
    """,
}
