"""Text-analysis surface bound to the `documents` table: token stats,
quality scoring, language-ID, fingerprinting. Integer/string outputs only
— no float drift possible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textops as T
from .base import load, register

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


# --------------------------------------------------------------------------
# token counting
# --------------------------------------------------------------------------
@register(
    "zz_x01_token_stats",
    sql=f"""
    SELECT doc_id,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_distinct,
           length(text) AS n_chars
    FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    """,
    survey_ref="LLM-pipeline: token counting",
    tags=("text",),
    bench=True,
)
def zz_x01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    tok = T.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword-ratio signals as exact
# integers + an integer-rule quality flag
# --------------------------------------------------------------------------
_EN_STOP = list(T.STOPWORDS["en"])


@register(
    "zz_x02_quality_score",
    sql=f"""
    SELECT doc_id, n_tokens, total_token_chars, n_punct, n_stop,
           (n_tokens >= 10 AND n_stop * 20 >= n_tokens) AS is_quality
    FROM (
      SELECT doc_id,
             len(t) AS n_tokens,
             CAST(COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS BIGINT)
               AS total_token_chars,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT)
               AS n_punct,
             len(list_filter(t, x -> list_contains({_EN_STOP}, x))) AS n_stop
      FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    )
    """,
    survey_ref="LLM-pipeline: quality scoring",
    tags=("text",),
    bench=True,
)
def zz_x02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    # materialize the token array before the aggregate/filter lambdas —
    # CSE does not cross HOF lambda boundaries (re-split per element)
    tok = F.col("t")
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOP])
    base = docs.select(
        "doc_id", "text", T.tokens(F.col("text")).alias("t")
    ).select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.coalesce(
            F.aggregate(
                tok,
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.length(x),
            ),
            F.lit(0),
        ).alias("total_token_chars"),
        T.punct_count(F.col("text")).alias("n_punct"),
        F.size(F.filter(tok, lambda x: F.array_contains(stop_arr, x))).alias(
            "n_stop"
        ),
    )
    return base.withColumn(
        "is_quality",
        (F.col("n_tokens") >= 10)
        & (F.col("n_stop") * 20 >= F.col("n_tokens")),
    )


# --------------------------------------------------------------------------
# language ID: stopword-hit argmax over literal per-language lists
# --------------------------------------------------------------------------
@register(
    "zz_x03_lang_id",
    sql=f"""
    SELECT doc_id, {T.sql_lang_pred("td")} AS lang_pred
    FROM (SELECT doc_id, list_distinct({_TOKS}) AS td FROM documents)
    """,
    survey_ref="LLM-pipeline: language ID heuristic",
    tags=("text",),
    bench=True,
)
def zz_x03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    scores = T.lang_scores(F.col("td"))
    return docs.select(
        "doc_id", F.array_distinct(T.tokens(F.col("text"))).alias("td")
    ).select("doc_id", T.lang_pred(scores).alias("lang_pred"))


# --------------------------------------------------------------------------
# corpus-level n-gram statistics: top bigrams with deterministic ties
# --------------------------------------------------------------------------
@register(
    "zz_x05_top_bigrams",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks
    )
    SELECT bigram, count(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram ASC LIMIT 20
    """,
    survey_ref="LLM-pipeline: corpus n-gram statistics",
    tags=("text", "agg", "topk"),
    bench=True,
)
def zz_x05_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    # token array materialized first: inlining tokens() into the
    # transform lambda re-splits the text per bigram element (~11x cost)
    tok = F.col("t")
    bigrams = F.when(
        F.size(tok) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - 2),
            lambda i: F.concat_ws(" ", F.get(tok, i), F.get(tok, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(T.tokens(F.col("text")).alias("t"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# document fingerprinting: md5 over sorted distinct token set
# --------------------------------------------------------------------------
@register(
    "zz_x04_fingerprint",
    sql=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
    FROM documents
    """,
    survey_ref="LLM-pipeline: document fingerprinting",
    tags=("text",),
    bench=True,
)
def zz_x04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.fingerprint(T.tokens(F.col("text"))).alias("fp")
    )


# --------------------------------------------------------------------------
# training-data curation (operators/curation.py): deterministic splits +
# per-shard sequence packing. Rotated into the driver's 50-row recorded
# window in round 5 so these entries get driver CORRECTNESS rows.
# --------------------------------------------------------------------------
@register(
    "zz_x06_deterministic_split",
    sql="""
    WITH b AS (
      SELECT doc_id,
             (('0x' || substr(md5('split-v1' || CAST(doc_id AS VARCHAR)), 1, 15))
              ::BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket IS NULL THEN NULL
                WHEN bucket < 98 THEN 'train'
                WHEN bucket < 99 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    survey_ref="LLM-pipeline: reproducible train/val/test split",
    tags=("curation",),
)
def zz_x06_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import deterministic_split

    (docs,) = load(spark, sf_dir, "documents")
    return deterministic_split(docs).select("doc_id", "split")


@register(
    "zz_x07_sequence_packing",
    sql=f"""
    WITH t AS (
      SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS h
      FROM documents
    ),
    s AS (SELECT doc_id, n_tokens, h % 64 AS shard, h AS ord FROM t)
    SELECT doc_id, shard, n_tokens,
           CAST(CAST(coalesce(sum(n_tokens) OVER w, 0) AS BIGINT) // 2048
                AS BIGINT) AS pack_id,
           CAST(coalesce(sum(n_tokens) OVER w, 0) AS BIGINT) AS start_offset
    FROM s
    WINDOW w AS (PARTITION BY shard ORDER BY ord, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
    survey_ref="LLM-pipeline: per-shard greedy sequence packing",
    tags=("curation", "window"),
)
def zz_x07_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import sequence_packing

    (docs,) = load(spark, sf_dir, "documents")
    return sequence_packing(docs)


# --------------------------------------------------------------------------
# BPE-ish subword counting (the brief's "whitespace + BPE-ish regex"
# pair: x01 counts word tokens, this counts pre-tokenizer segments).
# --------------------------------------------------------------------------
@register(
    "zz_x08_bpe_token_count",
    sql=f"""
    SELECT doc_id,
           CAST({T.SQL_BPE_COUNT.format(col='text')} AS BIGINT)
             AS n_bpe_tokens,
           CAST(len({_TOKS}) AS BIGINT) AS n_word_tokens,
           length(text) AS n_chars
    FROM documents
    """,
    survey_ref="LLM-pipeline: BPE-ish subword counting",
    tags=("text", "curation"),
)
def zz_x08_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.bpe_ish_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("n_word_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# round-5 additions (z-prefixed so they sort AFTER the driver's first-50
# recorded window and don't displace the rotated entries; rotate them in
# next round): benchmark decontamination, repetition metrics, stratified
# sampling, tf/df top terms.
# --------------------------------------------------------------------------
_EVAL_MOD = 50  # doc_id % 50 == 0 → held-out eval membership


@register(
    "zz_z03_decontaminate",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, unnest({T.sql_shingles(4)}) AS g FROM toks),
    ev AS (SELECT DISTINCT g FROM g WHERE doc_id % {_EVAL_MOD} = 0)
    SELECT g.doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_eval_grams
    FROM g JOIN ev USING (g)
    WHERE g.doc_id % {_EVAL_MOD} <> 0
    GROUP BY g.doc_id
    """,
    survey_ref="LLM-pipeline: benchmark n-gram decontamination",
    tags=("text", "curation"),
    bench=True,
)
def z03_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import decontaminate

    (docs,) = load(spark, sf_dir, "documents")
    return decontaminate(docs, eval_cond=F.col("doc_id") % _EVAL_MOD == 0, n=4)


@register(
    "zz_z04_repetition_stats",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, unnest({T.sql_shingles(3)}) AS g FROM toks),
    c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS BIGINT) AS max_gram_count,
           CAST((sum(c) - count(*)) * 1000 // sum(c) AS BIGINT) AS dup_permille
    FROM c GROUP BY doc_id
    """,
    survey_ref="LLM-pipeline: within-document repetition metrics",
    tags=("text", "agg"),
    bench=True,
)
def z04_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import repetition_stats

    (docs,) = load(spark, sf_dir, "documents")
    return repetition_stats(docs, n=3)


_SAMPLE_RATES = {"en": 150}
_SAMPLE_DEFAULT = 800


def _z05_sql() -> str:
    from ..operators.curation import sql_sample_bucket

    return f"""
    WITH b AS (
      SELECT doc_id, lang, {sql_sample_bucket('doc_id')} AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket FROM b
    WHERE bucket < (CASE WHEN lang = 'en' THEN {_SAMPLE_RATES['en']}
                         ELSE {_SAMPLE_DEFAULT} END)
    """


@register(
    "zz_z05_stratified_sample",
    sql=_z05_sql(),
    survey_ref="LLM-pipeline: deterministic stratified sampling",
    tags=("curation",),
    bench=True,
)
def z05_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import stratified_sample

    (docs,) = load(spark, sf_dir, "documents")
    return stratified_sample(docs, rates=_SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT)


@register(
    "zz_z06_tfidf_top_terms",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    terms AS (SELECT doc_id, unnest(t) AS term FROM toks),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    s AS (SELECT tf.doc_id, tf.term, tf.tf AS tf, dfq.df AS df,
                 tf.tf * 1000000 // dfq.df AS score
          FROM tf JOIN dfq USING (term)),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term ASC) AS rn
          FROM s)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(score AS BIGINT) AS score
    FROM r WHERE rn <= 3
    """,
    survey_ref="LLM-pipeline: per-document tf/df top terms",
    tags=("text", "agg", "topk"),
    bench=True,
)
def z06_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import tfidf_top_terms

    (docs,) = load(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)


@register(
    "zz_z10_chunking",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    s AS (SELECT doc_id, t, unnest(range(0, len(t), 30)) AS start FROM toks)
    SELECT doc_id,
           CAST(start // 30 AS BIGINT) AS chunk_id,
           CAST(len(t[start + 1 : start + 40]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(t[start + 1 : start + 40], ' ')) AS chunk_md5
    FROM s
    """,
    survey_ref="LLM-pipeline: sliding-window document chunking",
    tags=("text", "curation"),
    bench=True,
)
def z10_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import chunk_documents

    (docs,) = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=40, stride=30)


@register(
    "zz_z11_boilerplate_ngrams",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT DISTINCT doc_id, unnest({T.sql_shingles(3)}) AS g FROM toks)
    SELECT g, count(*) AS n_docs
    FROM g GROUP BY g HAVING count(*) >= 5
    """,
    survey_ref="LLM-pipeline: cross-document boilerplate n-grams (C4 line filter)",
    tags=("text", "dedup"),
    bench=True,
)
def z11_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import boilerplate_ngrams

    (docs,) = load(spark, sf_dir, "documents")
    return boilerplate_ngrams(docs, n=3, min_docs=5)


@register(
    "zz_z19_corpus_diff",
    sql="""
    WITH old AS (SELECT doc_id, md5(text) AS old_md5 FROM documents
                 WHERE doc_id % 10 <> 0),
    new AS (SELECT doc_id,
                   md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
                            ELSE text END) AS new_md5
            FROM documents WHERE doc_id % 11 <> 3)
    SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old_md5 IS NULL THEN 'added'
                WHEN new_md5 IS NULL THEN 'removed'
                WHEN old_md5 <> new_md5 THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
    survey_ref="LLM-pipeline: snapshot diff (incremental corpus refresh)",
    tags=("curation", "join"),
    bench=True,
)
def z19_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic snapshot views of the same table simulate a
    recrawl: the old snapshot lacks every 10th doc (→ added), the new
    one lacks doc_id % 11 == 3 (→ removed) and revises doc_id % 7 == 0
    (→ changed)."""
    from ..operators.corpus import corpus_diff

    (docs,) = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 11 != 3).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" rev2"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new)


# mixture planning: 5 head sources get 10% target share each, the tail
# sources 3% each — per-source sampling rates for the largest total the
# corpus serves without upsampling (DoReMi-static / Pile-style mixing)
_MIX_TARGETS = {f"src{i}": (100 if i < 5 else 30) for i in range(20)}
_MIX_TGT_SQL = ", ".join(
    f"('{s}', {t})" for s, t in sorted(_MIX_TARGETS.items())
)


@register(
    "zz_z09_mixture_weights",
    sql=f"""
    WITH tok AS (SELECT source, CAST(len({_TOKS}) AS BIGINT) AS nt
                 FROM documents),
    av AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS avail
           FROM tok GROUP BY source),
    tgt(source, target_permille) AS (VALUES {_MIX_TGT_SQL}),
    j AS (SELECT tgt.source, coalesce(avail, 0) AS avail, target_permille
          FROM tgt LEFT JOIN av USING (source)),
    nmax AS (SELECT MIN(avail * 1000 // target_permille) AS n_max FROM j)
    SELECT source, avail, CAST(target_permille AS BIGINT) AS target_permille,
           CAST(target_permille * n_max // 1000 AS BIGINT) AS need_tokens,
           CAST(CASE WHEN avail > 0
                THEN (target_permille * n_max // 1000) * 1000 // avail
                ELSE 0 END AS BIGINT) AS rate_permille
    FROM j CROSS JOIN nmax
    """,
    survey_ref="LLM-pipeline: mixture planning (per-source sampling rates)",
    tags=("curation", "agg"),
    bench=True,
)
def z09_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import mixture_weights

    (docs,) = load(spark, sf_dir, "documents")
    avail = (
        docs.select("source", F.size(T.tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("avail"))
    )
    return mixture_weights(avail, _MIX_TARGETS)


# --------------------------------------------------------------------------
# PII / pattern scrubbing
# --------------------------------------------------------------------------
_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_URL_SQL = "https?://[^\\s]+"


@register(
    "zz_x09_pattern_scrub",
    sql=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_SQL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_URL_SQL}')) AS BIGINT)
             AS n_urls,
           md5(regexp_replace(
                 regexp_replace(text, '{_EMAIL_SQL}', '<EMAIL>', 'g'),
                 '{_URL_SQL}', '<URL>', 'g')) AS scrubbed_md5
    FROM documents
    """,
    survey_ref="LLM-pipeline: PII/pattern scrubbing",
    tags=("text", "curation"),
)
def zz_x09_pattern_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.pattern_count(F.col("text"), T.EMAIL_RE).cast("bigint").alias(
            "n_emails"
        ),
        T.pattern_count(F.col("text"), T.URL_RE).cast("bigint").alias(
            "n_urls"
        ),
        F.md5(T.scrub_patterns(F.col("text"))).alias("scrubbed_md5"),
    )


# --------------------------------------------------------------------------
# z22: per-source quality-quantile floor — the "drop the worst quarter of
# each source" curation gate. Rank-based percentile (smallest score whose
# cumulative count reaches ceil(n/4)) over the bounded permille score
# domain, so the floor is integer/order logic identical in both engines —
# interpolating percentile functions differ between Spark and DuckDB and
# never appear. (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
@register(
    "zz_z22_quality_floor",
    sql=f"""
    WITH scored AS (
      SELECT doc_id, source,
             len(list_filter(t, x -> list_contains({_EN_STOP}, x)))
               * 1000 // len(t) AS score
      FROM (SELECT doc_id, source, {_TOKS} AS t FROM documents)
      WHERE len(t) > 0
    ),
    counts AS (SELECT source, score, count(*) AS c FROM scored GROUP BY 1, 2),
    cum AS (
      SELECT source, score,
             sum(c) OVER (PARTITION BY source ORDER BY score) AS cum,
             sum(c) OVER (PARTITION BY source) AS n
      FROM counts
    ),
    floors AS (
      SELECT source, min(score) AS floor
      FROM cum WHERE cum >= (n * 1 + 3) // 4 GROUP BY source
    )
    SELECT s.doc_id, s.source, s.score, f.floor
    FROM scored s JOIN floors f USING (source)
    WHERE s.score >= f.floor
    """,
    survey_ref="LLM-pipeline: per-source quality-quantile floor filter",
    tags=("text", "curation", "agg"),
    bench=True,
)
def z22_quality_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import quality_floor_filter

    (docs,) = load(spark, sf_dir, "documents")
    return quality_floor_filter(docs, stopwords=tuple(_EN_STOP))


# --------------------------------------------------------------------------
# z24: token-budget corpus selection — greedy (score DESC, doc_id ASC)
# whole-document take while the inclusive running token total fits
# B = total·600 div 1000. The ORACLE uses the naive global-window
# definition; the Spark side uses the exact bounded-score-domain
# decomposition (no corpus sort — see operators/corpus.py), so the
# parity check proves the decomposition correct every run.
# (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
_BUDGET_PERMILLE = 600


@register(
    "zz_z24_token_budget_select",
    sql=f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter(t, x -> list_contains({_EN_STOP}, x)))
               * 1000 // len(t) AS score,
             len(t) AS n_tokens
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
      WHERE len(t) > 0
    ),
    tot AS (SELECT sum(n_tokens) AS total FROM scored),
    ord AS (
      SELECT doc_id, score, n_tokens,
             sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC) AS cum
      FROM scored
    )
    SELECT doc_id, score, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM ord, tot
    WHERE cum <= total * {_BUDGET_PERMILLE} // 1000
    """,
    survey_ref="LLM-pipeline: greedy token-budget corpus selection",
    tags=("text", "curation", "window"),
    bench=True,
)
def z24_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import token_budget_select

    (docs,) = load(spark, sf_dir, "documents")
    return token_budget_select(
        docs, budget_permille=_BUDGET_PERMILLE, stopwords=tuple(_EN_STOP)
    )


# --------------------------------------------------------------------------
# z26: vocabulary construction + OOV rate — top-V document-frequency
# vocab, then per-doc out-of-vocab occurrence rate in integer permille
# (the tokenizer-coverage diagnostic). The top-V rank sorts only the
# vocabulary table; the corpus pass is a broadcast membership probe.
# (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
_VOCAB_V = 500


@register(
    "zz_z26_vocab_oov",
    sql=f"""
    WITH terms AS (
      SELECT doc_id, unnest(t) AS term
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
    ),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
    vocab AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS rn
        FROM dfreq
      ) WHERE rn <= {_VOCAB_V}
    ),
    per AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN term IN (SELECT term FROM vocab)
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
      FROM terms GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_oov,
           n_oov * 1000 // n_tokens AS oov_permille
    FROM per
    """,
    survey_ref="LLM-pipeline: vocabulary construction + OOV rate",
    tags=("text", "agg"),
    bench=True,
)
def z26_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import vocab_oov_stats

    (docs,) = load(spark, sf_dir, "documents")
    return vocab_oov_stats(docs, vocab_size=_VOCAB_V)


# --------------------------------------------------------------------------
# z29: per-source length-outlier flags — exact distributed z-score via
# the integer inequality (n·x − S)²·k_den² > k_num²·(n·Q − S²), evaluated
# in DECIMAL(38,0) (Spark) / int128 (DuckDB): bit-identical booleans
# where a float σ would drift on reduction order. k = 2σ.
# (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
@register(
    "zz_z29_length_outliers",
    sql="""
    WITH st AS (
      SELECT source,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(n_chars) AS HUGEINT) AS s,
             CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS q
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           (st.n * d.n_chars - st.s) * (st.n * d.n_chars - st.s)
             > 4 * (st.n * st.q - st.s * st.s) AS is_outlier
    FROM documents d JOIN st ON d.source = st.source
    """,
    survey_ref="LLM-pipeline: per-source numeric outlier flags (exact z-score)",
    tags=("text", "agg", "curation"),
    bench=True,
)
def z29_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import group_zscore_outliers

    (docs,) = load(spark, sf_dir, "documents")
    return group_zscore_outliers(
        docs, "source", "n_chars", id_cols=("doc_id",), k_num=2, k_den=1
    )


# --------------------------------------------------------------------------
# z32: pairwise source divergence — total-variation distance between
# per-source unigram distributions in integer ppm: the mixture-planning
# diagnostic (which sources are near-duplicates distributionally, which
# are outliers). Matched-part self-join + per-source totals closes the
# union without a per-pair full-outer join; the oracle runs the same
# decomposition. (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
@register(
    "zz_z32_source_divergence",
    sql=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS}) AS tok FROM documents
    ),
    uni AS (SELECT source, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS total
            FROM uni GROUP BY 1),
    p AS (SELECT u.source, u.tok, 1000000 * u.cnt // t.total AS p
          FROM uni u JOIN tot t ON u.source = t.source),
    tsum AS (SELECT source, CAST(sum(p) AS BIGINT) AS tppm
             FROM p GROUP BY 1),
    m AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(sum(abs(a.p - b.p)) AS BIGINT) AS d_m,
             CAST(sum(a.p) AS BIGINT) AS pa_m,
             CAST(sum(b.p) AS BIGINT) AS pb_m
      FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT x.source AS source_a, y.source AS source_b,
           (COALESCE(m.d_m, 0) + (x.tppm - COALESCE(m.pa_m, 0))
            + (y.tppm - COALESCE(m.pb_m, 0))) // 2 AS tvd_ppm
    FROM tsum x JOIN tsum y ON x.source < y.source
    LEFT JOIN m ON m.source_a = x.source AND m.source_b = y.source
    """,
    survey_ref="LLM-pipeline: source unigram TVD (mixture diagnostics)",
    tags=("text", "agg", "join"),
    bench=True,
)
def z32_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    return T.source_unigram_tvd(docs)


# --------------------------------------------------------------------------
# z33: per-source lexical diversity — type/token ratio + distinct-bigram
# ratio in integer permille: the synthetic-text / template-spam tripwire
# (templated sources keep normal TTR but collapsed bigram diversity).
# (z-name: sorts after the driver's first-50 window.)
# --------------------------------------------------------------------------
_BIGRAMS = "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])"


@register(
    "zz_z33_ngram_diversity",
    sql=f"""
    WITH base AS (SELECT source, {_TOKS} AS t FROM documents),
    uni AS (
      SELECT source, count(*) AS n_tokens,
             count(DISTINCT g) AS d_uni
      FROM (SELECT source, unnest(t) AS g FROM base) GROUP BY 1
    ),
    bi AS (
      SELECT source, count(*) AS n_bigrams,
             count(DISTINCT g) AS d_bi
      FROM (SELECT source, unnest({_BIGRAMS}) AS g FROM base) GROUP BY 1
    )
    SELECT u.source, u.n_tokens, b.n_bigrams,
           1000 * u.d_uni // u.n_tokens AS ttr_permille,
           1000 * b.d_bi // b.n_bigrams AS distinct_bigram_permille
    FROM uni u JOIN bi b ON u.source = b.source
    """,
    survey_ref="LLM-pipeline: lexical diversity (TTR / distinct-n)",
    tags=("text", "agg"),
    bench=True,
)
def z33_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    return T.ngram_diversity(docs)


# --------------------------------------------------------------------------
# zx7: collocation extraction — top-k two-word phrases by exact-integer
# PMI ratio (observed/expected ×10⁶; a monotone transform of PMI so
# the ranking is the PMI ranking with no logs/floats anywhere). The
# corpus-linguistics counterpart of x05's raw bigram counts: "spark
# streaming" ranks by surprise, not frequency. 128-bit numerator, see
# operators/textops.collocations. (zx-name: sorts after the z03–z52
# driver window this round; rotates in next.)
# --------------------------------------------------------------------------
@register(
    "zx7_collocations",
    sql=f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    uni AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    n_tot AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM uni),
    bi AS (
      SELECT g[1] AS w1, g[2] AS w2, count(*) AS c_xy
      FROM (SELECT unnest(list_transform(range(1, len(t)),
                          i -> [t[i], t[i+1]])) AS g
            FROM toks)
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT w1, w2, c_xy, x.c AS c_x, y.c AS c_y,
           CAST((CAST(c_xy AS HUGEINT) * N * 1000000)
                // (CAST(x.c AS HUGEINT) * y.c) AS BIGINT) AS score_ppm
    FROM bi
    JOIN uni x ON bi.w1 = x.w
    JOIN uni y ON bi.w2 = y.w
    CROSS JOIN n_tot
    ORDER BY score_ppm DESC, w1 ASC, w2 ASC LIMIT 50
    """,
    survey_ref="LLM-pipeline: collocation extraction (integer PMI ratio)",
    tags=("text", "agg", "topk"),
    bench=True,
)
def zx7_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    return T.collocations(docs, k=50, min_count=5)
