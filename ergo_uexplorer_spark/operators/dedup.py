"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale posture (the part that matters at 100 TB):
  * exact dedup is one hash-groupBy — partial aggregation map-side, no
    row data moves, only (hash, count, min_id);
  * all-pairs n-gram Jaccard is the quadratic *baseline*; its join key is
    the shingle, so hot shingles (stopword trigrams) create skew — AQE
    skew-join splits them, and the LSH variant below is the scale path
    (candidates only from tiny band-buckets, never all-pairs);
  * MinHash signatures are ONE shuffle (groupBy doc over exploded
    shingles with 12 `min` partial aggs); banding is a projection; the
    band self-join touches only bucket collisions;
  * SimHash is linear: explode (doc × 32 bits) → two groupBys.

Thresholds are exact integer arithmetic (`den*shared >= num*union`), so
results are engine-independent — no float Jaccard in any predicate.

All sketch constants (hash params, bands) live here and are imported by
the oracle-SQL generators in `suite/dedup.py`, so Spark and DuckDB always
agree on the algorithm.
"""

from __future__ import annotations

import random
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import portable_hash, shingles, tokens

# ---------------------------------------------------------------------------
# MinHash constants (seeded, shared with the SQL oracle)
# ---------------------------------------------------------------------------
MINHASH_PRIME = 2147483647  # 2^31 - 1: a*h + b stays < 2^63
NUM_HASHES = 12
LSH_BANDS = 4
LSH_ROWS = 3  # bands * rows == num_hashes

_rng = random.Random(42)
MINHASH_A = tuple(_rng.randrange(1, MINHASH_PRIME) for _ in range(NUM_HASHES))
MINHASH_B = tuple(_rng.randrange(0, MINHASH_PRIME) for _ in range(NUM_HASHES))

SIMHASH_BITS = 32
SIMHASH_MOD = 1 << SIMHASH_BITS


def normalized_text(col):
    """lower + collapse whitespace — exact-dup canonical form."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Tokenize/shingle stages are CPU-bound string work: a corpus that
    arrives in few files (one 128 MB parquet = 1 partition) would pin a
    single core. Spread it before exploding; no-op when the scan already
    has enough splits (the 100 TB case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct normalized text,
    keeping the min id as the canonical representative."""
    return (
        _ensure_parallelism(docs)
        .select(
            F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_in_group"),
        )
    )


def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, s) distinct word-n-gram shingles (string form — the exact
    baseline)."""
    return _ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(F.col(text_col)), n)).alias("s"),
    ).distinct()


def hashed_shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, h) distinct hashed shingles: project each shingle to its
    60-bit portable hash BEFORE the distinct shuffle — the network moves
    8-byte longs instead of shingle strings, and every downstream join
    (signatures, verification) is a long-key join. Collisions (~2^-60
    per pair) merge shingles on BOTH engines identically, so the oracle
    stays exact."""
    sh = _ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(F.col(text_col)), n)).alias("s"),
    )
    return sh.select("doc_id", portable_hash(F.col("s")).alias("h")).distinct()


def jaccard_pairs(
    sh: DataFrame, num: int = 4, den: int = 5, elem_col: str = "s"
) -> DataFrame:
    """All-pairs Jaccard ≥ num/den over shingle sets (quadratic baseline).

    Returns (doc_a, doc_b, shared, na, nb) with doc_a < doc_b. The join
    key is the shingle; AQE skew-join handles hot shingles. For corpus
    scale use `minhash_lsh_pairs` instead.
    """
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nn"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.{elem_col}") == F.col(f"b.{elem_col}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(
            counts.select(F.col("doc_id").alias("doc_a"), F.col("nn").alias("na")),
            "doc_a",
        )
        .join(
            counts.select(F.col("doc_id").alias("doc_b"), F.col("nn").alias("nb")),
            "doc_b",
        )
        .filter(
            F.lit(den) * F.col("shared")
            >= F.lit(num) * (F.col("na") + F.col("nb") - F.col("shared"))
        )
        .select("doc_a", "doc_b", "shared", "na", "nb")
    )


def minhash_signatures(sh_hashed: DataFrame) -> DataFrame:
    """12 minhashes per doc in one shuffle (12 partial `min` aggs) over
    hashed shingle sets (doc_id, h)."""
    hm = sh_hashed.withColumn("hm", F.col("h") % MINHASH_PRIME)
    aggs = [
        F.min(
            (F.lit(MINHASH_A[i]) * F.col("hm") + F.lit(MINHASH_B[i]))
            % MINHASH_PRIME
        ).alias(f"mh{i}")
        for i in range(NUM_HASHES)
    ]
    return hm.groupBy("doc_id").agg(*aggs)


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Banded LSH candidate pairs (doc_a < doc_b) from minhash signatures."""
    bands = []
    for bi in range(LSH_BANDS):
        cols = [f"mh{bi * LSH_ROWS + r}" for r in range(LSH_ROWS)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(bi).alias("band"),
                F.concat_ws("-", *cols).alias("bsig"),
            )
        )
    allb = reduce(DataFrame.unionByName, bands)
    a, b = allb.alias("a"), allb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num: int = 4,
    den: int = 5,
) -> DataFrame:
    """MinHash→LSH→exact-verify near-dup pairs ≥ num/den Jaccard.

    The exact verification join runs ONLY over LSH candidates (semi-join
    pushes the candidate set into the shingle join) — this is the
    shape that survives a 100× corpus scale-up.

    The hashed shingle set feeds both the signature pass and the
    verification join: persist it once (it is the expensive scan), and
    every shuffle downstream carries longs, not strings.
    """
    sh = hashed_shingle_sets(docs, id_col, text_col, n).persist()
    cand = lsh_candidates(minhash_signatures(sh)).persist()
    verified = jaccard_pairs(
        sh.join(
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct(),
            "doc_id",
            "left_semi",
        ),
        num,
        den,
        elem_col="h",
    )
    return verified.join(cand, ["doc_a", "doc_b"], "left_semi")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash over distinct unigram tokens → (doc_id, simhash)."""
    spark = docs.sparkSession
    tok = _ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    ).distinct()
    hm = tok.withColumn("hm", portable_hash(F.col("w")) % SIMHASH_MOD)
    bits = spark.createDataFrame(
        [(j, 1 << j) for j in range(SIMHASH_BITS)], "j int, pw long"
    )
    contrib = hm.crossJoin(F.broadcast(bits)).withColumn(
        "sgn",
        F.when(F.expr("(hm div pw) % 2") == 1, 1).otherwise(-1),
    )
    per_bit = contrib.groupBy("doc_id", "j", "pw").agg(F.sum("sgn").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.col("pw")).otherwise(0)).alias("simhash")
    )


def simhash_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance (xor + bit_count).

    All-pairs here (fine ≤ ~10^5 docs); at corpus scale, block on
    simhash byte-prefixes first (pigeonhole: hamming ≤ 3 over 4 blocks ⇒
    one block equal).
    """
    a = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha")
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.expr("ha ^ hb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
