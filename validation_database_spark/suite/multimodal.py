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
    kernel (deterministic stub decode) — now FULLY value-checked
    against a DuckDB oracle, not rows-only:

    The stub kernel's arithmetic is engineered to be replayable in
    SQL: the corpus is ASCII (so DuckDB ``ord(substr(...))`` over the
    text equals the payload byte), the checksum is an exact integer
    sum, and each feature is the float64 quotient of an exact
    rational (4-byte stripe sum / 1020) — IEEE-identical in numpy and
    DuckDB — rounded to 6 and CSV-serialized for the hash compare
    (the driver cannot canonicalize array cells). The array-typed
    ``features`` column remains the programmatic API on
    ``extract_features``."""
    docs = load_table(spark, "documents", sf_dir)
    assets = assets_from_documents(docs)
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        "n_bytes",
        "payload_crc",
        F.expr(
            "array_join(transform(features, x -> printf('%.6f', round(x, 6))), ',')"
        ).alias("features_csv"),
    )


# The kernel's exact recurrence in SQL: byte j of the tiled 64-byte
# head is text byte ((j) % n) (0-based), feature k = sum of bytes
# 4k..4k+3 over 1020.
_FEATURE_TERM = " + ".join(
    f"ord(substr(text, CAST((4 * k + {m}) % n AS INT) + 1, 1))" for m in range(4)
)

ORACLE_MULTIMODAL_FEATURES = f"""
WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents)
SELECT doc_id AS asset_id,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(list_aggregate(
              list_transform(range(1, CAST(n AS INT) + 1),
                             i -> ord(substr(text, CAST(i AS INT), 1))),
              'sum') % 4294967296 AS BIGINT) AS payload_crc,
       array_to_string(
         list_transform(range(0, 16),
                        k -> printf('%.6f', ROUND(({_FEATURE_TERM}) / 1020.0, 6))),
         ',') AS features_csv
FROM b
"""


def q_frame_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling with per-frame decode over the video assets:
    every other 16-byte "frame" of the payload is sampled and
    "decoded" (stub checksum) through the row-expanding mapInPandas
    kernel (operators/multimodal.py::frame_checksums). Value-checked:
    the corpus is ASCII, so the oracle replays each frame's byte-sum
    as ord(substr(text, ...)) over the same offsets."""
    from ..operators.multimodal import frame_checksums
    from ..util import spread

    docs = spread(load_table(spark, "documents", sf_dir))
    assets = assets_from_documents(docs).filter(F.col("meta.modality") == "video")
    return frame_checksums(assets)


ORACLE_FRAME_CHECKSUMS = """
WITH v AS (
  SELECT doc_id AS asset_id, text, CAST(length(text) AS BIGINT) AS n
  FROM documents WHERE doc_id % 3 = 2
),
fr AS (
  SELECT asset_id, text, n, unnest(range(0, n, 32)) AS frame_off FROM v
)
SELECT asset_id, frame_off,
       least(16, n - frame_off) AS frame_len,
       CAST(list_sum(list_transform(
              generate_series(CAST(frame_off + 1 AS INT), CAST(least(frame_off + 16, n) AS INT)),
              i -> ord(substr(text, i, 1)))) AS BIGINT) AS frame_crc
FROM fr
"""


# round 6 rotation: the never-driver-checked frame-sampling and
# binary-dedup ops take the window; multimodal_features (driver-green
# r2–r5) moves to the unit surface (bench keeps timing it).
SPECS = []  # populated after the query definitions below

def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media deduplication on the BINARY payload column —
    content-hash groupBy, the first dedup pass every multimodal
    training pipeline runs (identical bytes from mirror crawls):
    planted duplicate assets (modular copies, ids +1M) collapse onto
    their originals via ``md5(payload)``. The hash is computed over
    the real binary column JVM-side; the DuckDB oracle hashes the
    source text instead (DuckDB's md5 is VARCHAR-only), which is
    byte-identical here because the corpus is ASCII and the payload
    is its utf-8 encoding.

    Scale: a narrow per-row hash then one map-side-combining groupBy
    on the 128-bit key — O(distinct assets) shuffle, payload bytes
    never shuffled (only their hash and length)."""
    docs = load_table(spark, "documents", sf_dir)
    assets = assets_from_documents(docs)
    copies = assets.filter(F.col("asset_id") % 10 == 0).select(
        (F.col("asset_id") + 1_000_000).alias("asset_id"), "payload", "meta"
    )
    both = assets.unionByName(copies)
    return (
        both.select(
            "asset_id",
            F.md5("payload").alias("content_key"),
            F.col("meta.modality").alias("modality"),
            F.octet_length("payload").alias("n_bytes"),
        )
        .groupBy("content_key")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("asset_id").alias("canonical_asset_id"),
            F.min("modality").alias("modality"),
            F.min("n_bytes").cast("bigint").alias("n_bytes"),
        )
    )


ORACLE_MEDIA_DEDUP = """
WITH assets AS (
  SELECT doc_id AS asset_id, text,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END
  FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS content_key,
       count(*) AS n_copies,
       min(asset_id) AS canonical_asset_id,
       min(modality) AS modality,
       CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes
FROM assets GROUP BY md5(text)
"""


SPECS += [
    QuerySpec("unit_frame_checksums", q_frame_checksums,
              ORACLE_FRAME_CHECKSUMS,
              "video frame sampling + per-frame stub decode, value-checked"),
    QuerySpec("unit_media_dedup", q_media_dedup, ORACLE_MEDIA_DEDUP,
              "binary-payload content-hash dedup with planted copies"),
]

UNIT_SPECS = [
    # rotated out in the second round-5 rotation (driver-green r2-r4):
    QuerySpec("multimodal_meta", q_multimodal_meta, ORACLE_MULTIMODAL_META,
              "per-modality metadata stats, payload-pruning layout"),
    # rotated out in round 6 (driver-green r2–r5):
    QuerySpec("multimodal_features", q_multimodal_features,
              ORACLE_MULTIMODAL_FEATURES,
              "Arrow-batched stub-decode feature extraction, value-checked",
              headline=True),
]
