"""Round-7 surface additions, batch 4 (zyc1–zyc5): sparse retrieval
(BM25 top-k, reciprocal-rank fusion), SCD2 history building, sweep-line
peak concurrency, and RFM customer segmentation.

Names sort after zyb5 and before the `zz_` tail — all five land inside
the driver's recorded 50-name window (displacing only `zz_` entries that
already carry r4–r6 recorded rows).

Retrieval exactness: BM25's idf is the exact integer-scaled odds
`((2(N−df)+1)·S) div (2df+1)` (log-free, per-term order preserving) and
its tf saturation is the closed rational form `22·tf·L div
(10·tf·L + 3·L + 9·dl·N)` for k1=6/5, b=3/4 — see
operators/retrieval.py. RRF uses floor-scaled `S div (k+rank)`. Every
global rank goes through `ordered_prefix` (range-partitioned), every
running sum through the same — no single-task windows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import load, register
from .temporal import SESSION_GAP_NS
from .textops import _TOKS

_BM25_TERMS = ("vector", "hash", "spark")
_SCALE = 10**6
_RRF_SCALE = 10**12


# --------------------------------------------------------------------------
# zyc1: BM25 top-k retrieval — exact integer BM25-odds scoring over the
# documents table for a fixed bag-of-terms query; ties at the k boundary
# break by doc id. The sparse half of a RAG retrieval stack (the dense
# half is s01/s02/z02's ANN family; zyc5 fuses rankings).
# --------------------------------------------------------------------------
@register(
    "zyc1_bm25_topk",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
    stats AS (SELECT count(*) AS n, sum(dl) AS l FROM base),
    terms AS (SELECT doc_id, dl, unnest(t) AS term FROM base),
    tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM terms
      WHERE term IN ('vector', 'hash', 'spark') GROUP BY 1, 2, 3
    ),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    sc AS (
      SELECT tf.doc_id,
             (CAST(2 * (s.n - dfq.df) + 1 AS HUGEINT) * {_SCALE}
              // (2 * dfq.df + 1))
             * (CAST({_SCALE} AS HUGEINT) * 22 * tf.tf * s.l
                // (CAST(10 AS HUGEINT) * tf.tf * s.l
                    + CAST(3 AS HUGEINT) * s.l
                    + CAST(9 AS HUGEINT) * tf.dl * s.n)) AS contrib
      FROM tf JOIN dfq USING (term) CROSS JOIN stats s
    ),
    agg AS (SELECT doc_id, sum(contrib) AS score_num FROM sc GROUP BY 1)
    SELECT doc_id, CAST(score_num AS VARCHAR) AS score
    FROM agg ORDER BY score_num DESC, doc_id ASC LIMIT 20
    """,
    survey_ref="LLM-pipeline: sparse retrieval (BM25-odds, exact "
    "integers; operators/retrieval.bm25_topk)",
    tags=("text", "topk", "retrieval"),
)
def zyc1_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk

    (docs,) = load(spark, sf_dir, "documents")
    return bm25_topk(docs, list(_BM25_TERMS), k=20, scale=_SCALE)


# --------------------------------------------------------------------------
# zyc2: SCD2 validity intervals — each user's event-type history
# collapsed to consecutive-state runs with end-exclusive valid_from /
# valid_to and an is_current flag. The type-2 dimension builder (the
# reference keeps only the LATEST state; this is the full history twin).
# --------------------------------------------------------------------------
@register(
    "zyc2_scd2_intervals",
    sql="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_ns(ts) AS tsn
      FROM events
    ),
    l AS (
      SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                     THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id
                          ORDER BY tsn NULLS FIRST, event_id NULLS FIRST)
    ),
    v AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id
                               ORDER BY tsn NULLS FIRST,
                                        event_id NULLS FIRST
                               ROWS UNBOUNDED PRECEDING) AS version
      FROM l
    ),
    runs AS (
      SELECT user_id, CAST(version AS BIGINT) AS version,
             min(event_type) AS state,
             min(tsn) AS valid_from, count(*) AS n_events
      FROM v GROUP BY 1, 2
    )
    SELECT user_id, state, version,
           CAST(valid_from AS BIGINT) AS valid_from,
           CAST(lead(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY version) AS BIGINT)
             AS valid_to,
           CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                                 ORDER BY version) IS NULL
                     THEN 1 ELSE 0 END AS BIGINT) AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM runs
    """,
    survey_ref="SURVEY §2.3 C5 latest-state family → full SCD2 history "
    "(operators/intervals.scd2_intervals)",
    tags=("window", "temporal"),
)
def zyc2_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import scd2_intervals

    (events,) = load(spark, sf_dir, "events")
    out = scd2_intervals(events, "user_id", "event_type", "ts", "event_id")
    return out.select(
        "user_id",
        F.col("event_type").alias("state"),
        "version",
        "valid_from",
        "valid_to",
        F.col("is_current").cast("long").alias("is_current"),
        "n_events",
    )


# --------------------------------------------------------------------------
# zyc3: peak concurrency — sessionize events (30-min gap), then the
# sweep line over session intervals: the max number of simultaneously
# open sessions and the earliest instant it is reached. The capacity-
# planning question; the global running sum goes through ordered_prefix.
# --------------------------------------------------------------------------
@register(
    "zyc3_peak_concurrency",
    sql=f"""
    WITH l AS (
      SELECT user_id, event_id, epoch_ns(ts) AS tsn,
             lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_ns(ts), event_id) AS prev
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, tsn,
             CASE WHEN prev IS NULL OR tsn - prev > {SESSION_GAP_NS}
                  THEN 1 ELSE 0 END AS is_new
      FROM l
    ),
    sid AS (
      SELECT user_id, tsn,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s
    ),
    sess AS (
      SELECT user_id, session_id, min(tsn) AS st, max(tsn) AS en
      FROM sid GROUP BY 1, 2
    ),
    pts AS (
      SELECT st AS t, 1 AS d FROM sess
      UNION ALL
      SELECT en AS t, -1 AS d FROM sess
    ),
    c AS (
      SELECT t, sum(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS cum
      FROM pts
    )
    SELECT CAST(cum AS BIGINT) AS peak, CAST(t AS BIGINT) AS ts_at_peak
    FROM c ORDER BY cum DESC, t ASC LIMIT 1
    """,
    survey_ref="streaming extension: interval analytics (sweep line via "
    "ordered_prefix; operators/intervals.peak_concurrency)",
    tags=("window", "temporal"),
)
def zyc3_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import peak_concurrency

    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        events.withColumn("__prev", F.lag("ts").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("ts") - F.col("__prev") > SESSION_GAP_NS),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__sid",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "__sid")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    return peak_concurrency(sess, "st", "en")


# --------------------------------------------------------------------------
# zyc4: RFM segmentation - each customer's recency/frequency/monetary
# quintile scores, reported as populated-cell counts (≤125 rows). Exact
# rank-based bins via ordered_prefix; deterministic under ties.
# --------------------------------------------------------------------------
@register(
    "zyc4_rfm_segments",
    sql="""
    WITH per AS (
      SELECT o_custkey,
             max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS r,
             count(*) AS f,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m
      FROM orders GROUP BY 1
    ),
    n AS (SELECT count(*) AS n FROM per),
    rk AS (
      SELECT o_custkey,
             row_number() OVER (ORDER BY r ASC, o_custkey ASC) AS kr,
             row_number() OVER (ORDER BY f ASC, o_custkey ASC) AS kf,
             row_number() OVER (ORDER BY m ASC, o_custkey ASC) AS km
      FROM per
    )
    SELECT CAST((kr - 1) * 5 // n.n + 1 AS BIGINT) AS r_score,
           CAST((kf - 1) * 5 // n.n + 1 AS BIGINT) AS f_score,
           CAST((km - 1) * 5 // n.n + 1 AS BIGINT) AS m_score,
           count(*) AS n_entities
    FROM rk CROSS JOIN n
    GROUP BY 1, 2, 3
    """,
    survey_ref="LLM-pipeline: entity segmentation (rank-quintile RFM; "
    "operators/stats.rfm_segments)",
    tags=("agg", "window"),
)
def zyc4_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import rfm_segments

    (orders,) = load(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        F.unix_date(F.col("o_orderdate").cast("date")).alias("__days"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("__cents"),
    )
    return rfm_segments(o, "o_custkey", "__days", "__cents", n_bins=5)


# --------------------------------------------------------------------------
# zyc5: reciprocal-rank fusion — fuse an attribute ranking (longest
# documents first) with a term-frequency ranking (most 'vector' hits
# first) into one RRF top-20. The standard hybrid-retrieval combiner
# for sparse + dense rankings.
# --------------------------------------------------------------------------
@register(
    "zyc5_rrf_fusion",
    sql=f"""
    WITH toks AS (SELECT doc_id, n_chars, {_TOKS} AS t FROM documents),
    base AS (
      SELECT doc_id, n_chars,
             len(list_filter(t, x -> x = 'vector')) AS tfv
      FROM toks
    ),
    a AS (SELECT doc_id,
                 row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS ra
          FROM base),
    b AS (SELECT doc_id,
                 row_number() OVER (ORDER BY tfv DESC, doc_id ASC) AS rb
          FROM base),
    s AS (
      SELECT doc_id,
             {_RRF_SCALE} // (60 + ra) + {_RRF_SCALE} // (60 + rb)
               AS rrf_score
      FROM a JOIN b USING (doc_id)
    )
    SELECT doc_id, CAST(rrf_score AS BIGINT) AS rrf_score
    FROM s ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
    """,
    survey_ref="LLM-pipeline: hybrid-retrieval rank fusion "
    "(operators/retrieval.rrf_fuse)",
    tags=("topk", "retrieval"),
)
def zyc5_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cumulative import ordered_prefix
    from ..operators.retrieval import rrf_fuse
    from ..operators.textops import tokens

    (docs,) = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "n_chars",
        F.size(
            F.filter(tokens(F.col("text")), lambda x: x == F.lit("vector"))
        ).alias("__tfv"),
    )
    # an UNKNOWN signal ranks LAST (sentinel > every real negated
    # value): the bare -col would turn NULL signals into nulls-FIRST
    # top ranks under Spark's ASC default, while the oracle's DESC
    # puts them last — the dirty-twin sweep caught the rank shift
    last = F.lit(2**62).cast("long")
    a = ordered_prefix(
        base.select(
            "doc_id", F.coalesce(-F.col("n_chars"), last).alias("__na")
        ),
        ["__na", "doc_id"],
        row_col="rk",
    ).select("doc_id", "rk")
    b = ordered_prefix(
        base.select(
            "doc_id", F.coalesce(-F.col("__tfv"), last).alias("__nb")
        ),
        ["__nb", "doc_id"],
        row_col="rk",
    ).select("doc_id", "rk")
    return rrf_fuse([a, b], k=60, scale=_RRF_SCALE, top=20)
