#!/usr/bin/env python
"""Driver-contract verification harness (surface 1 of
.claude/skills/verify/SKILL.md): import __spark_entry__ by path the
way the round driver does, smoke-check entry(), and compare every
queries() entry against its oracle_sql() in DuckDB at sf0.01 with the
driver's canonicalization (sort columns, NaN->None, round floats to
9, naive timestamps, sorted rows). Exit 0 iff zero mismatches.

Usage: python scripts/verify_contract.py [sf_dir]

``sf_dir`` defaults to the driver's /root/testdata/sf0.01; pass
/root/testdata/sf0.1 for the 10×-the-driver sweep — worth one run per
round: value hazards are scale-dependent (the round-6 sweep caught a
round-half-tie in doc_profile's avg_logprob that sf0.01 never hits,
9 of 5000 docs).
"""
import importlib.util, math, sys
import duckdb, pandas as pd
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

rows = mod.entry(spark).collect()
assert len(rows) == 1, rows
vals = list(rows[0].asDict().values())
assert all((v or 0) > 0 for v in vals if isinstance(v, (int, float))), rows
print("entry OK:", rows[0].asDict())

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = []
    for _, row in pdf.iterrows():
        r = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                r.append(None)
            elif isinstance(v, float):
                r.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                r.append(str(pd.Timestamp(v).tz_localize(None) if getattr(v, "tzinfo", None) else v))
            else:
                r.append(v)
        out.append(tuple(r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

qs, osql = mod.queries(), mod.oracle_sql()
# Release each spec's determinism/reuse pins before the next one runs
# (mirrors bench.py — ADVICE r6: pins are corpus-sized and
# CacheManager never GCs). Without this the sf0.1 sweep accumulates
# every window spec's cached frames in one session and can OOM the
# driver heap partway through (seen first with the round-10 window's
# r5-cohort seats), turning the tail of the window into phantom
# errors.
from validation_database_spark.util import release_pins

bad = []
for name, fn in qs.items():
    try:
        spdf = fn(spark, SF).toPandas()
        if name not in osql:
            print(f"{name}: rows-only ({len(spdf)})"); continue
        dpdf = con.execute(osql[name]).fetchdf()
        s, d = canon(spdf), canon(dpdf)
        ok = s == d
        if not ok:
            bad.append(name)
            print(f"{name}: MISMATCH spark={len(s)} duck={len(d)}")
        else:
            print(f"{name}: ok ({len(s)})")
    except Exception as e:
        bad.append(name); print(f"{name}: ERROR {e}")
    finally:
        release_pins()
print("MISMATCHES:", bad)
sys.exit(1 if bad else 0)
