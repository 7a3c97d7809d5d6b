#!/usr/bin/env python
"""Round-13 doc_profile attribution: time each metric-projection
component over the same tokenized frame with a noop sink (guide §1.4).
Each expression runs cold+warm in one session; wall seconds printed.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/r13_docprofile_micro.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from validation_database_spark.session import get_spark
    from validation_database_spark.sources import load_table
    from validation_database_spark.suite.text import EMBED_DIM, STOPWORDS
    from validation_database_spark.util import spread

    spark = get_spark(app_name="r13_docprofile_micro")
    docs = spread(load_table(spark, "documents", SF_DIR))
    bound = docs.selectExpr(
        "doc_id",
        "text",
        "filter(split(lower(text), ' '), x -> x != '') AS toks",
        r"regexp_replace(lower(text), '\\s+', ' ') AS norm",
    )
    bound.persist()
    bound.write.format("noop").mode("overwrite").save()

    def n_hits_sql(ws):
        inlist = ", ".join(f"'{w}'" for w in ws)
        return f"cast(size(filter(toks, x -> x in ({inlist}))) as bigint)"

    tri = (
        "transform(sequence(1, greatest(size(toks) - 2, 1)), "
        "i -> array_join(slice(toks, i, 3), ' '))"
    )
    bits = ", ".join(
        f"shiftright(cast(conv(substring(h, {j // 4 + 1}, 1), 16, 10) as bigint),"
        f" {3 - (j % 4)}) % 2"
        for j in range(16)
    )
    votes = (
        "aggregate(transform(array_distinct(toks), t -> substring(md5(t), 1, 4)), "
        f"array_repeat(0L, 16), (acc, h) -> zip_with(acc, array({bits}), "
        "(v, b) -> v + b * 2 - 1))"
    )
    simhash = (
        f"cast(aggregate(transform({votes}, "
        "(v, j) -> if(v > 0, power(2.0D, cast(j as double)), 0.0D)), "
        "0.0D, (a, b) -> a + b) as bigint)"
    )
    counts = (
        f"aggregate(transform(toks, t -> cast(conv(substring(md5(t), 1, 2), 16, 10) "
        f"as int) % {EMBED_DIM}), array_repeat(0.0D, {EMBED_DIM}), "
        "(acc, b) -> transform(acc, (v, i) -> if(i = b, v + 1.0D, v)))"
    )
    nrm_of = "sqrt(aggregate(c, 0.0D, (a, y) -> a + y * y))"
    csv = (
        "concat_ws(',', transform(c, x -> format_string('%.6f', "
        f"round(x / greatest({nrm_of}, 1E-12D), 6))))"
    )

    # candidate cheaper count forms (same value)
    counts_seqfilter = (
        f"transform(sequence(0, {EMBED_DIM - 1}), i -> cast(size(filter("
        f"transform(toks, t -> cast(conv(substring(md5(t), 1, 2), 16, 10) as int)"
        f" % {EMBED_DIM}), b -> b = i)) as double))"
    )
    counts_sorted = (
        f"transform(sequence(0, {EMBED_DIM - 1}), i -> cast(size(filter("
        f"array_sort(transform(toks, t -> cast(conv(substring(md5(t), 1, 2), 16, 10) as int)"
        f" % {EMBED_DIM})), b -> b = i)) as double))"
    )

    cases = {
        "baseline_docid": ["doc_id"],
        "stopword+langs": [
            "doc_id",
            f"{n_hits_sql(STOPWORDS['en'])} AS s_en",
            *[
                f"{n_hits_sql(ws)} AS score_{lang}"
                for lang, ws in STOPWORDS.items()
            ],
        ],
        "trigram_rep": [
            "doc_id",
            f"round(cast(greatest(size(toks) - 2, 1) - size(array_distinct({tri})) "
            "as double) / greatest(greatest(size(toks) - 2, 1), 1), 6) AS rr",
        ],
        "simhash": ["doc_id", f"{simhash} AS simhash"],
        "counts_fold": ["doc_id", f"{counts} AS c"],
        "counts_seqfilter": ["doc_id", f"{counts_seqfilter} AS c"],
        "counts_fold+csv": ["doc_id", f"{counts} AS c0", ],
        "csv_from_counts": None,  # built below
    }

    def run(label, exprs, df=None):
        frame = (df if df is not None else bound).selectExpr(*exprs)
        for tag in ("cold", "warm"):
            spark.sparkContext.setJobDescription(f"{label}:{tag}")
            t0 = time.perf_counter()
            frame.write.format("noop").mode("overwrite").save()
            print(f"{label:22s} {tag}: {time.perf_counter() - t0:6.2f}s", flush=True)

    run("baseline_docid", cases["baseline_docid"])
    run("stopword+langs", cases["stopword+langs"])
    run("trigram_rep", cases["trigram_rep"])
    run("simhash", cases["simhash"])
    run("counts_fold", cases["counts_fold"])
    run("counts_seqfilter", cases["counts_seqfilter"])
    # verify the two count forms agree
    a = bound.selectExpr("doc_id", f"{counts} AS c")
    b = bound.selectExpr("doc_id", f"{counts_seqfilter} AS c")
    n_diff = a.join(b, "doc_id").filter("a.c IS DISTINCT FROM b.c") if False else (
        a.alias("a").join(b.alias("b"), "doc_id")
        .filter("a.c != b.c").count()
    )
    print(f"counts forms differ on {n_diff} docs", flush=True)
    # full counts+csv (the real projection tail)
    run(
        "counts_fold+csv",
        ["doc_id", f"{csv.replace('(c,', f'({counts},').replace('(c ', f'({counts} ')} AS e"]
        if False
        else ["doc_id", f"{counts} AS c"],
    )
    staged = bound.selectExpr("doc_id", f"{counts} AS c")
    run("csv_over_counts", ["doc_id", f"{csv} AS e"], df=staged)
    spark.stop()


if __name__ == "__main__":
    main()
