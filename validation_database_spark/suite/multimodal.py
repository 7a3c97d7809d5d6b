"""Multimodal queries: metadata-only analytics (payload never read —
parquet column pruning at scale) and the Arrow-batched feature
pipeline (rows-only check: mapInPandas is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import assets_from_documents, extract_features
from ..sources import load_table
from . import QuerySpec


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality stats over the typed metadata + payload size.
    Metadata-only: a columnar store never touches the payload bytes
    for this plan (only octet_length, computable from the column
    statistics / the encoded column itself)."""
    docs = load_table(spark, "documents", sf_dir)
    assets = assets_from_documents(docs)
    return assets.groupBy(F.col("meta.modality").alias("modality")).agg(
        F.count("*").alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max("meta.duration_ms").alias("max_duration_ms"),
        F.min("meta.width").alias("min_width"),
    )


ORACLE_MULTIMODAL_META = """
WITH assets AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         octet_length(encode(text)) AS n_bytes,
         length(text) * 10 AS duration_ms,
         CAST(doc_id % 640 AS INT) AS width
  FROM documents
)
SELECT modality,
       count(*) AS n_assets,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       max(duration_ms) AS max_duration_ms,
       min(width) AS min_width
FROM assets GROUP BY modality
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → feature-vector pipeline through the mapInPandas
    kernel (deterministic stub decode). Rows-only check — the Arrow
    kernel is not SQL-expressible."""
    docs = load_table(spark, "documents", sf_dir)
    assets = assets_from_documents(docs)
    feats = extract_features(assets)
    return feats.select("asset_id", "n_bytes", "payload_crc", F.size("features").alias("feature_dim"))


SPECS = [
    QuerySpec("multimodal_meta", q_multimodal_meta, ORACLE_MULTIMODAL_META,
              "per-modality metadata stats, payload-pruning layout"),
    QuerySpec("multimodal_features", q_multimodal_features, None,
              "Arrow-batched stub-decode feature extraction (rows-only)", headline=True),
]
