"""Skew mitigation: salted joins.

At 100 TB a handful of hot keys (the reference domain's analog: one
id value covering a third of a table) turn a shuffle join into a
single straggler task. AQE's skew-join handles sort-merge cases
(enabled in session.py); explicit salting is the general tool when
the skewed side must hash-join against a replicable right side:

- large side: append ``salt = hash(row) % n`` → hot key splits into n
  sub-keys across n tasks;
- small side: explode each row into all n salts;
- join on (key, salt); drop the salt.

Result is row-for-row identical to the unsalted join (verified in
tests), with the hot key's work fanned across ``n`` tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` (skewed on ``on``) with ``small`` by salting.

    ``small`` is replicated ``num_salts``× — appropriate when it is
    dimension-sized. Supported ``how``: inner, left (semantics
    preserved because every large row carries exactly one salt and
    every small row exists for every salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(num_salts))
    l = large.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    joined = l.join(s, [on, "__salt"], how)
    return joined.drop("__salt")
