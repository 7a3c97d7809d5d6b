"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the distributed generalization of the reference's pairwise
fuzzy match (running_validation.py:306-316) to corpus scale.

Everything here is built from JVM-side expressions (md5, arrays,
higher-order functions) — no Python UDFs — and every hash is derived
from md5, which exists with identical semantics in DuckDB, so each
stage is oracle-checkable.

Scale design:
- Shingling/minhash is a narrow map (no shuffle).
- The only shuffles are the per-doc signature aggregation and the
  LSH band self-join; band buckets bound the join fan-out, so the
  quadratic pair space is never materialized (that's the entire point
  of LSH — the brute-force path is O(n²) and dies at 100 TB).
- ``min(md5(seed || shingle))`` is a valid MinHash: each seeded md5
  is a uniform pseudo-permutation of the shingle universe and the
  lexicographic min over hex strings picks its minimum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _lsh_env(name: str, default: int) -> int:
    """LSH geometry knob (VERDICT r11 ask #1), same discipline as the
    IVF ``_geo`` knobs: the DEFAULT is the fixture-determinism value
    every oracle replays; a deployment sizes the geometry to its
    corpus (``lsh_geometry`` below is the rule) via
    ``SPARK_GRAFT_LSH_BANDS`` / ``SPARK_GRAFT_LSH_ROWS``. Read once
    at import so the Spark builders and the f-string DuckDB oracles
    bake the SAME geometry — the cross-engine value check stays
    exact at any setting."""
    import os

    return int(os.environ.get(f"SPARK_GRAFT_LSH_{name}", default))


# MinHash/LSH geometry: b bands of r rows each (k = b·r signatures) →
# candidate-pair threshold ≈ (1/b)^(1/r); the default 4×4 gives
# 0.25^0.25 ≈ 0.71 Jaccard. NUM_HASHES is DERIVED (= b·r) so the
# knobs can never produce an inconsistent slice layout.
NUM_BANDS = _lsh_env("BANDS", 4)
ROWS_PER_BAND = _lsh_env("ROWS", 4)
NUM_HASHES = NUM_BANDS * ROWS_PER_BAND
SHINGLE_WORDS = 5


def lsh_geometry(
    n_docs: int,
    threshold: float = 2 ** -0.5,
    rows_base: int = 4,
    docs_base: int = 50_000,
) -> tuple[int, int, int]:
    """Corpus-size-aware band geometry: ``(num_hashes, num_bands,
    rows_per_band)`` for an ``n_docs`` corpus at a fixed S-curve
    midpoint (VERDICT r11 ask #1).

    Why a FIXED geometry drifts super-linearly (the round-11 sf100
    census: candidates grew 7.1× for 3.3× docs at 4×4): a pair of
    similarity s becomes a candidate with probability
    1-(1-s^r)^b ≈ b·s^r for s below the midpoint t=(1/b)^(1/r) —
    a CONSTANT per-pair rate, while the number of sub-threshold
    pairs grows ~n². Expected spurious candidates per doc is
    therefore ~n·(s/t)^r: linear in corpus size at fixed r.

    The rule (the standard S-curve steepening, Leskovec-Rajaraman-
    Ullman, Mining of Massive Datasets §3.4): hold the midpoint t
    fixed and add one row per band per DECADE of corpus growth —
    r = rows_base + ceil(log10(n/docs_base)), b = round(t^-r) (so
    (1/b)^(1/r) stays ≈ t), k = b·r. Each +1 row multiplies the
    sub-threshold collision rate by (s/t) < 1 — e.g. ×0.57 at
    s = 0.4 under t = 0.707 — while pairs AT the midpoint keep
    per-pair catch probability ~1-(1-1/b)^b → 1-1/e. The price is
    signature width: k grows ~2^(r/2) for t = 2^-1/2, i.e. ~1.4×
    per decade of corpus — the verify-side candidate savings
    (super-linear) dominate the signature-side cost (sub-linear in
    n) at every measured point (SCALE.md round 12).

    Anchors (pinned by tests/test_dedup_geometry.py): ≤ 50k docs →
    the fixture default (16, 4, 4); 1.5M–5M docs (the sf30/sf100
    replicas) → (48, 8, 6), the geometry the round-12 census
    measures; 500M → (128, 16, 8)."""
    import math

    if n_docs <= docs_base:
        r = rows_base
    else:
        r = rows_base + math.ceil(math.log10(n_docs / docs_base))
    b = max(1, round(threshold ** -r))
    return b * r, b, r


def normalized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), "\\s+", " ")


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), " "), lambda x: x != F.lit(""))


def word_shingles(toks: Column, n: int = SHINGLE_WORDS) -> Column:
    """Overlapping word n-grams as strings; docs shorter than n words
    collapse to one truncated shingle (slice past the end returns the
    available tail — same as DuckDB list slicing, and unlike
    element_at it is ANSI-mode safe).

    slice+array_join benchmarks 3-4× faster than per-position get()
    calls (one array op per shingle instead of n lookups)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def exploded_shingles(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id, shingle) pairs, distinct per doc — the set representation.

    The source rows are spread across cores first: shingling + the
    downstream per-shingle md5s are the CPU-heavy part and must not be
    serialized onto one input partition (see util.spread).

    Per-doc distinctness is ROW-LOCAL (round 13): every shingle of a
    doc lives in that doc's one array row, so ``array_distinct``
    before the explode produces exactly the rows the old
    ``.distinct()`` after it did — while the distinct's Exchange +
    HashAggregate over the full (id, shingle) frame (the largest frame
    of every shingle pipeline) disappears from all eight consumers.
    Requires ``id_col`` unique per input row, which every caller
    satisfies (the fixture PK, and the planted-dup helpers offset
    their copies by +1e6). Same row-local-set discipline as
    ``with_rowlocal_signatures``.
    """
    from ..util import spread

    return (
        spread(docs.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(tokens(text_col)))
            ).alias("sh"),
        )
    )


SLICES_PER_MD5 = 4  # 32 hex chars → 4 independent 8-hex (32-bit) values


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = NUM_HASHES) -> DataFrame:
    """One row per doc with columns s0..s{k-1}: the k min-hashes.
    Single groupBy pass — k aggregates, one shuffle.

    Each seeded md5 is sliced into four independent 8-hex (32-bit)
    values, so k signatures cost k/4 md5 evaluations per shingle —
    the md5s are materialized once in a projection. (min over an
    8-hex slice is still a uniform pseudo-permutation minimum; 32
    bits is ample for per-doc shingle counts.)

    The slices are decoded to BIGINT before the min (round 12):
    fixed-width lowercase hex sorts identically lexicographic and
    numeric, so every min picks the SAME shingle's hash and every
    downstream band-bucket equality is preserved — but a k-wide
    STRING min forces the whole aggregation into SortAggregate
    (string aggregate buffers are immutable, so HashAggregate cannot
    hold them), measured as the dominant stage of the LSH specs: the
    k=48 spec spent 2× ~2 s sorting the full shingle frame per run.
    BIGINT buffers keep the same aggregate inside HashAggregate (no
    sort, map-side combine) and halve the shuffled signature bytes."""
    n_md5 = (num_hashes + SLICES_PER_MD5 - 1) // SLICES_PER_MD5
    with_hashes = shingles.select(
        F.col(id_col),
        *[
            F.md5(F.concat(F.lit(f"{seed}|"), F.col("sh"))).alias(f"h{seed}")
            for seed in range(n_md5)
        ],
    )
    aggs = []
    for i in range(num_hashes):
        seed, sl = divmod(i, SLICES_PER_MD5)
        aggs.append(
            F.min(
                F.conv(
                    F.substring(F.col(f"h{seed}"), 1 + 8 * sl, 8), 16, 10
                ).cast("bigint")
            ).alias(f"s{i}")
        )
    return with_hashes.groupBy(id_col).agg(*aggs)


def with_rowlocal_signatures(docs: DataFrame, text_col: str = "text",
                             num_hashes: int = NUM_HASHES) -> DataFrame:
    """The same min-hash signature as :func:`minhash_signatures`,
    computed as ROW-LOCAL array expressions — no explode, no groupBy,
    no shuffle. This is the streaming-safe form: a stateless narrow
    map, usable on an unbounded stream ahead of a stream-static band
    join (a streaming groupBy would need watermark/output-mode
    machinery for what is per-row arithmetic).

    Identity with the shuffle form is pinned by
    ``tests/test_streaming_incremental.py`` (same md5-slice hash
    family over the same distinct-shingle set). Batch pipelines
    should prefer :func:`minhash_signatures`: the exploded groupBy
    lets the scan, distinct and min share whole-stage codegen over
    skinny rows, while this form holds each doc's full shingle array
    in one row."""
    # Factories, not default-arg captures: a second lambda parameter
    # (even a defaulted one) makes transform() bind it to the element
    # INDEX — see the F.transform note in word_shingles' module.
    def seeded_md5(seed: int):
        prefix = F.lit(f"{seed}|")
        return lambda s: F.md5(F.concat(prefix, s))

    def hex_slice(sl: int):
        # BIGINT decode before the min — same argmin as the hex form
        # (fixed-width lowercase hex sorts identically lexicographic
        # and numeric); keeps this twin value-identical to
        # :func:`minhash_signatures` (pinned by
        # tests/test_streaming_incremental.py).
        return lambda h: F.conv(F.substring(h, 1 + 8 * sl, 8), 16, 10).cast(
            "bigint"
        )

    sh = F.array_distinct(word_shingles(tokens(text_col)))
    out = docs.withColumn("__sh", sh)
    n_md5 = (num_hashes + SLICES_PER_MD5 - 1) // SLICES_PER_MD5
    for seed in range(n_md5):
        out = out.withColumn(
            f"__h{seed}", F.transform(F.col("__sh"), seeded_md5(seed))
        )
    for i in range(num_hashes):
        seed, sl = divmod(i, SLICES_PER_MD5)
        out = out.withColumn(
            f"s{i}",
            F.array_min(F.transform(F.col(f"__h{seed}"), hex_slice(sl))),
        )
    return out.drop("__sh", *[f"__h{s}" for s in range(n_md5)])


def lsh_bands(sigs: DataFrame, id_col: str = "doc_id",
              num_bands: int = NUM_BANDS,
              rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """(id, band, band_hash): hash of each band's signature slice."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)],
                    )
                ).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band bucket.
    The join key (band, band_hash) bounds fan-out to bucket sizes."""
    a = bands.select(
        F.col(id_col).alias("id_a"), "band", "band_hash"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), "band", "band_hash"
    )
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, shingles: DataFrame,
                   id_col: str = "doc_id", scale: int = 6) -> DataFrame:
    """Exact Jaccard for candidate pairs via the inverted index:
    |A∩B| from a shingle-equijoin, |A∪B| = |A|+|B|-|A∩B|.

    (A set-collect + array_intersect variant was benchmarked 2.4×
    slower at sf1: each doc's array gets re-shipped once per pair it
    participates in, whereas the exploded join shuffles skinny
    (pair, shingle) rows with map-side combine on the count.)"""
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sh_a = shingles.select(F.col(id_col).alias("id_a"), "sh")
    sh_b = shingles.select(F.col(id_col).alias("id_b"), "sh")
    common = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                scale,
            ).alias("jaccard"),
        )
    )


SIMHASH60_BITS = 60
_CHUNK = 15  # bits per exact-double chunk (2^15 sums stay < 2^53)


def simhash60(toks: Column) -> Column:
    """60-bit SimHash of the distinct-token set, as a bigint — the
    production-width signature (Manku, Jain & Das Sarma 2007 use 64;
    60 = 15 md5 hex chars keeps the value positive in a signed
    bigint). Same vote construction as :func:`simhash16`, but the
    final weighted sum CANNOT run through one double accumulator —
    sums of distinct powers past 2^53 lose mantissa bits — so the
    signature is assembled from four EXACT 15-bit chunk sums combined
    with integer shifts."""
    hashes = F.transform(
        F.array_distinct(toks), lambda t: F.substring(F.md5(t), 1, _CHUNK)
    )

    def bits(h: Column) -> Column:
        nibbles = [
            F.conv(F.substring(h, i + 1, 1), 16, 10).cast("bigint")
            for i in range(_CHUNK)
        ]
        return F.array(
            *[
                F.shiftright(nibbles[j // 4], 3 - (j % 4)) % 2
                for j in range(SIMHASH60_BITS)
            ]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("bigint"), SIMHASH60_BITS),
        lambda acc, h: F.zip_with(acc, bits(h), lambda v, b: v + b * 2 - 1),
    )

    def chunk(c: int) -> Column:
        w = F.transform(
            F.slice(votes, _CHUNK * c + 1, _CHUNK),
            lambda v, i: F.when(v > 0, F.pow(F.lit(2.0), i.cast("double"))).otherwise(
                F.lit(0.0)
            ),
        )
        return F.aggregate(w, F.lit(0.0), lambda a, b: a + b).cast("bigint")

    return (
        chunk(0)
        + chunk(1) * F.lit(1 << _CHUNK)
        + chunk(2) * F.lit(1 << (2 * _CHUNK))
        + chunk(3) * F.lit(1 << (3 * _CHUNK))
    )


def simhash60_signatures(docs, id_col: str, toks: Column):
    """(id_col, sig) signature TABLE — same value as the
    :func:`simhash60` column expression, built in the codegen-friendly
    shape: explode the distinct feature set, hash once per feature,
    then 60 per-bit vote sums as ordinary aggregate expressions with
    map-side combine.

    Why a second form exists: a projection that folds the votes inside
    nested higher-order functions (aggregate → zip_with → transform,
    the :func:`simhash60` shape) drops out of whole-stage codegen and
    evaluates interpreted — measured 2.4× slower at sf0.1 and the
    dominant term of the sf10 signature build (SCALE.md "SimHash
    signature build"). Here every expression the executor loops over
    is plain integer arithmetic inside `* HashAggregate`; the explode
    fan-out (docs × distinct shingles) is exactly the rows the fold
    visited anyway. Empty feature sets survive via ``explode_outer``
    (null hash → null sums → all bits 0 → sig 0, matching the fold).

    The value is bit-identical to :func:`simhash60` (votes are
    order-independent integer sums), so the DuckDB oracle replay
    (``simhash60_bits_sql``) is unchanged."""
    h = docs.select(id_col, F.explode_outer(F.array_distinct(toks)).alias("tok"))
    h = h.select(id_col, F.substring(F.md5("tok"), 1, _CHUNK).alias("hx"))
    nib = [
        F.conv(F.substring("hx", i + 1, 1), 16, 10).cast("bigint")
        for i in range(_CHUNK)
    ]
    sums = [
        F.sum((F.shiftright(nib[j // 4], 3 - (j % 4)) % 2) * 2 - 1).alias(f"v{j}")
        for j in range(SIMHASH60_BITS)
    ]
    agg = h.groupBy(id_col).agg(*sums)

    def chunk(c: int) -> Column:
        e = None
        for i in range(_CHUNK):
            j = _CHUNK * c + i
            t = (
                F.when(F.col(f"v{j}") > 0, F.lit(1 << i).cast("bigint"))
                .otherwise(F.lit(0).cast("bigint"))
            )
            e = t if e is None else e + t
        return e

    sig = (
        chunk(0)
        + chunk(1) * F.lit(1 << _CHUNK)
        + chunk(2) * F.lit(1 << (2 * _CHUNK))
        + chunk(3) * F.lit(2 ** (3 * _CHUNK))
    )
    return agg.select(id_col, sig.alias("sig"))


def simhash16(toks: Column) -> Column:
    """16-bit SimHash of the distinct-token set, as a bigint.

    Per token, bit j of md5(token) (j in 0..15, taken from the first
    four hex chars, MSB-first within each char) votes ±1; the sign of
    each bit's vote sum sets that output bit. Pure integer/string
    expressions → portable to the DuckDB oracle.
    """
    # One md5 per token (the first 4 hex chars carry all 16 bits),
    # one aggregate pass accumulating the 16 vote counters as an
    # array — not 16 separate aggregates each re-hashing every token
    # (16× the md5 work and ~0.7 s of plan-build py4j chatter).
    hashes = F.transform(F.array_distinct(toks), lambda t: F.substring(F.md5(t), 1, 4))

    def bits(h: Column) -> Column:
        nibbles = [F.conv(F.substring(h, i + 1, 1), 16, 10).cast("bigint") for i in range(4)]
        return F.array(
            *[F.shiftright(nibbles[j // 4], 3 - (j % 4)) % 2 for j in range(16)]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("bigint"), 16),
        lambda acc, h: F.zip_with(acc, bits(h), lambda v, b: v + b * 2 - 1),
    )
    # bit j set iff vote j positive; 2^j ≤ 2^15 is exact in double
    weighted = F.transform(
        votes,
        lambda v, j: F.when(v > 0, F.pow(F.lit(2.0), j.cast("double"))).otherwise(
            F.lit(0.0)
        ),
    )
    return F.aggregate(weighted, F.lit(0.0), lambda a, b: a + b).cast("bigint")
