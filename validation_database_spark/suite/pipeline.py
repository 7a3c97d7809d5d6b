"""Data-pipeline lifecycle operators: upsert (CDC/SCD1 emulation),
deterministic hash sampling, and train/val/test splitting — the ops a
training-data pipeline runs between ingest and export.

No Delta/Iceberg in this image, so MERGE INTO is emulated
relationally (anti-join + union — the guide's recipe); the split and
sample are md5-prefix based so they are reproducible, stable under
re-partitioning, and identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import QuerySpec


# --- upsert (MERGE INTO emulation) ------------------------------------

def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """SCD1 upsert: updated rows replace matching target rows, new
    rows append (the anti-join + union MERGE emulation; with a
    lakehouse format this becomes a real MERGE INTO via
    sources/lakehouse.py)."""
    survivors = target.join(updates.select(key), key, "left_anti")
    return updates.unionByName(survivors)


def q_scd_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic update batch: every %10 customer gets +100
    acctbal, plus brand-new customers (+1M keys) for every %25 —
    output is the fully merged dimension."""
    cust = load_table(spark, "customer", sf_dir)
    changed = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2)
    )
    new = cust.filter(F.col("c_custkey") % 25 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    updates = changed.unionByName(new)
    return upsert(cust, updates, "c_custkey")


ORACLE_SCD_UPSERT = """
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey,
         ROUND(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, concat('NEW-', c_name), c_nationkey,
         0.0, c_mktsegment
  FROM customer WHERE c_custkey % 25 = 0
)
SELECT * FROM updates
UNION ALL
SELECT t.* FROM customer t
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = t.c_custkey)
"""


# --- deterministic hash sampling --------------------------------------

SAMPLE_PCT_HEX = "1999"  # md5-prefix < 0x1999/0xffff ≈ 10%


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of orders by md5-prefix comparison.
    Unlike ``df.sample``, the selection is a pure function of the key:
    reproducible across runs, engines, partitionings — the property a
    pipeline needs for stable holdout sets."""
    orders = load_table(spark, "orders", sf_dir)
    h = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4)
    return orders.filter(h < F.lit(SAMPLE_PCT_HEX)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


ORACLE_SAMPLE_HASH = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE substr(md5(CAST(o_orderkey AS STRING)), 1, 4) < '{SAMPLE_PCT_HEX}'
"""


# --- train/val/test split ---------------------------------------------

TRAIN_HEX = "cccc"  # ≈ 80%
VAL_HEX = "e666"    # ≈ 90% (next 10%)


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment for documents by md5
    prefix — stable under corpus growth (a doc's split never changes
    when other docs are added, unlike modulo-of-row-number schemes)."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(h < TRAIN_HEX, "train").when(h < VAL_HEX, "val").otherwise("test")
    )
    assigned = docs.select("doc_id", split.alias("split"))
    return assigned.groupBy("split").agg(F.count("*").alias("n_docs"))


ORACLE_TRAIN_SPLIT = f"""
SELECT CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 4) < '{TRAIN_HEX}' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS STRING)), 1, 4) < '{VAL_HEX}' THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""



def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted (importance) sampling: each document is
    kept with probability proportional to its length — keep iff
    u(doc_id) < n_chars / max_chars, where u is the md5-prefix uniform
    in [0,1). Reproducible, engine-portable, and stable per document
    (the id's hash never changes)."""
    docs = load_table(spark, "documents", sf_dir)
    max_chars = docs.agg(F.max("n_chars").alias("mx"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("double")
        / 65536.0
    )
    return (
        docs.crossJoin(F.broadcast(max_chars))
        .filter(u < F.col("n_chars").cast("double") / F.col("mx"))
        .select("doc_id", "n_chars")
    )


ORACLE_SAMPLE_WEIGHTED = """
WITH mx AS (SELECT max(n_chars) AS mx FROM documents)
SELECT doc_id, n_chars
FROM documents, mx
WHERE CAST(
        (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 4096
      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1) * 256
      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 3, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 4, 1)) - 1)
      AS DOUBLE) / 65536.0
      < CAST(n_chars AS DOUBLE) / mx
"""


SPECS = [
    QuerySpec("scd_upsert", q_scd_upsert, ORACLE_SCD_UPSERT,
              "MERGE INTO emulation: anti-join + union upsert"),
    QuerySpec("sample_hash", q_sample_hash, ORACLE_SAMPLE_HASH,
              "deterministic ~10% md5-prefix sample"),
    QuerySpec("sample_weighted", q_sample_weighted, ORACLE_SAMPLE_WEIGHTED,
              "deterministic length-weighted importance sample"),
    QuerySpec("train_split", q_train_split, ORACLE_TRAIN_SPLIT,
              "stable 80/10/10 train/val/test assignment"),
]
