"""Corpus cleaning: the composed training-data pipeline — exact dedup →
near-dup removal (MinHash+LSH) → quality gate — producing the kept-doc
set with its text signals. This is the operator a pretraining data job
actually runs; each stage is the already-verified primitive from
dedup.py / textops.py, composed with semi/anti joins so the corpus is
scanned once per stage and only ids flow between stages."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import textops as T


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    jaccard_num: int = 4,
    jaccard_den: int = 5,
) -> DataFrame:
    """Returns (doc_id, lang_pred, n_tokens) for documents that survive:
      1. exact dedup — keep the min-id canonical per normalized text;
      2. near-dup removal — for every verified LSH pair, drop the
         larger doc_id (deterministic victim rule);
      3. quality gate — ≥ min_tokens tokens.
    """
    canonical = (
        D.exact_dup_groups(docs, id_col, text_col)
        .select(F.col("keep_id").alias(id_col))
    )
    near_dup_victims = (
        D.minhash_lsh_pairs(docs, id_col, text_col, num=jaccard_num, den=jaccard_den)
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )
    # token array materialized before the score expressions (the CASE
    # chain references it ~20x; keep the regex split to one evaluation)
    signals = docs.select(
        F.col(id_col), T.tokens(F.col(text_col)).alias("t")
    ).select(
        F.col(id_col),
        F.size(F.col("t")).alias("n_tokens"),
        T.lang_pred(T.lang_scores(F.array_distinct(F.col("t")))).alias(
            "lang_pred"
        ),
    )
    return (
        signals.join(canonical, id_col, "left_semi")
        .join(near_dup_victims, id_col, "left_anti")
        .filter(F.col("n_tokens") >= min_tokens)
        .select(id_col, "lang_pred", "n_tokens")
    )


def decontaminate(
    docs: DataFrame,
    eval_cond,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Gopher n-gram overlap scan):
    flag every training document sharing at least one word `n`-gram with
    the held-out eval set, returning (doc_id, n_eval_grams) — the number
    of DISTINCT eval n-grams the document contains.

    `eval_cond` is a boolean Column marking eval membership. Scale shape:
    each document is shingled exactly once — the eval side shingles only
    eval-marked docs, the training side only the rest (a shared subplan
    would instead re-evaluate the tokenize+shingle pass per consumer).
    The eval gram set is tiny relative to the corpus (benchmarks are KBs
    against TBs of training data), so it is deduplicated and BROADCAST —
    the training side never shuffles for the membership probe, and the
    only exchange is the per-doc count aggregation with map-side
    partials.
    """
    def grams_of(side: DataFrame) -> DataFrame:
        return side.select(
            F.col(id_col), T.tokens(F.col(text_col)).alias("t")
        ).select(F.col(id_col), F.explode(T.shingles(F.col("t"), n)).alias("g"))

    eval_grams = grams_of(docs.filter(eval_cond)).select("g").distinct()
    return (
        grams_of(docs.filter(~eval_cond))
        .join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_eval_grams"))
    )


def repetition_stats(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-document repetition metrics (the Gopher repetition filters):
    per document, total word `n`-grams, distinct n-grams, the count of the
    most frequent single n-gram, and the duplicate fraction in permille
    (integer arithmetic on both engines — no float drift). Documents with
    fewer than `n` tokens have no n-grams and produce no row.

    One shuffle on (doc_id, gram) with map-side combine, then a second
    map-side-combinable rollup to the document — per-document work is
    bounded by document length, independent of corpus size.
    """
    grams = docs.select(
        F.col(id_col), T.tokens(F.col(text_col)).alias("t")
    ).select(F.col(id_col), F.explode(T.shingles(F.col("t"), n)).alias("g"))
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_gram_count"),
        F.expr("(sum(c) - count(1)) * 1000 div sum(c)").alias("dup_permille"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions → (doc_id, status) with
    status ∈ {added, removed, changed, unchanged} — the incremental-
    refresh primitive (recrawl vs previous snapshot: what must be
    re-deduped/re-scored, what can be dropped, what carries over).

    One full-outer hash join on the id with md5 content comparison; the
    texts themselves never shuffle (each side projects to (id, md5)
    before the join)."""
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("old_md5")
    )
    nw = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("new_md5")
    )
    return o.join(nw, id_col, "full_outer").select(
        id_col,
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 40,
    stride: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking (the RAG/pretraining chunker):
    split each document into `chunk_tokens`-token windows starting every
    `stride` tokens (overlap = chunk_tokens − stride), returning
    (doc_id, chunk_id, n_chunk_tokens, chunk_md5). The md5 stands in for
    the chunk text so downstream joins/dedup carry 16 bytes, not text.

    Pure projection + explode: per-row work is bounded by document
    length, no shuffle, composes with any scan. Empty documents produce
    no chunks.
    """
    t = F.col("t")
    starts = F.when(
        F.size(t) > 0,
        F.sequence(F.lit(0), F.size(t) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(t, F.col("start") + 1, chunk_tokens)
    return (
        docs.select(F.col(id_col), T.tokens(F.col(text_col)).alias("t"))
        .select(F.col(id_col), "t", F.explode(starts).alias("start"))
        .select(
            F.col(id_col),
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document boilerplate detection (the C4 "line appears in
    many documents" filter, n-gram form): word `n`-grams occurring in at
    least `min_docs` DISTINCT documents → (gram, n_docs). Feed the
    result back as an anti-join/`regexp_replace` scrub list.

    One (doc, gram)-distinct projection then a gram-keyed count with
    map-side partials; hot grams are exactly what it finds, and the
    output is vocabulary-bounded, never corpus-bounded.
    """
    grams = (
        docs.select(F.col(id_col), T.tokens(F.col(text_col)).alias("t"))
        .select(F.col(id_col), F.explode(T.shingles(F.col("t"), n)).alias("g"))
        .distinct()
    )
    return (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def _stopword_scored(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: tuple[str, ...] | None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *extra_cols, score, n_tokens) with score = stopword
    density in permille (integer n_stop·1000 div n_tokens); zero-token
    docs are dropped. The bounded 0..1000 score domain is what makes the
    downstream percentile/budget logic shuffle only a tiny (score,
    count) table instead of sorting the corpus."""
    from .textops import STOPWORDS

    stop_arr = F.array(
        *[F.lit(w) for w in (stopwords or tuple(STOPWORDS["en"]))]
    )
    tok = F.col("t")
    return (
        docs.select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            T.tokens(F.col(text_col)).alias("t"),
        )
        .filter(F.size(tok) > 0)
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.size(
                F.filter(tok, lambda x: F.array_contains(stop_arr, x))
            ).alias("n_stop"),
            F.size(tok).alias("n_tokens"),
        )
        .withColumn("score", F.expr("n_stop * 1000 div n_tokens"))
        .select(id_col, *extra_cols, "score", "n_tokens")
    )


def quality_floor_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    stopwords: tuple[str, ...] | None = None,
    q_num: int = 1,
    q_den: int = 4,
) -> DataFrame:
    """Per-group quality-quantile floor (the FineWeb-style "drop the
    worst quarter of each source" curation gate): score every document
    by stopword density in permille (integer: n_stop·1000 div n_tokens),
    compute each group's rank-based q-th percentile floor, and keep the
    documents at or above their group's floor → (doc_id, group, score,
    floor). Zero-token documents score nothing and are dropped.

    The floor is rank-based, not interpolated: the smallest score whose
    cumulative count reaches ceil(n·q_num/q_den) — pure integer/order
    logic, identical in any engine (interpolating percentiles differ
    between Spark and DuckDB).

    Scale shape: the score domain is bounded (0..1000 permille), so the
    floor comes from a (group, score) COUNT table — map-side-combinable,
    ≤ 1001 rows per group — and a cumulative window over that tiny
    table. The corpus itself is never sorted and never windows by group
    (a giant source would single-task such a window); the per-group
    floors broadcast back into the filter.
    """
    scored = _stopword_scored(
        docs, id_col, text_col, stopwords, extra_cols=(group_col,)
    ).select(id_col, group_col, "score")
    counts = scored.groupBy(group_col, "score").agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy(group_col)
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    floors = (
        counts.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wall))
        .filter(
            F.col("cum")
            >= F.expr(f"(n * {q_num} + {q_den - 1}) div {q_den}")
        )
        .groupBy(group_col)
        .agg(F.min("score").alias("floor"))
    )
    return (
        scored.join(F.broadcast(floors), group_col)
        .filter(F.col("score") >= F.col("floor"))
        .select(id_col, group_col, "score", "floor")
    )


def token_budget_select(
    docs: DataFrame,
    budget_permille: int = 600,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] | None = None,
) -> DataFrame:
    """Greedy token-budget corpus selection: take whole documents in
    (quality score DESC, doc_id ASC) priority order while the running
    token total stays within B = total_tokens·budget_permille div 1000 —
    "fill the training budget with the best data first". Returns the
    kept docs as (doc_id, score, n_tokens); a document is kept iff its
    inclusive running total ≤ B, so the boundary score group is taken
    partially in doc_id order.

    Scale shape: the naive form is a GLOBAL sort + cumulative window —
    a single-task scan at 100 TB. Here the bounded permille score domain
    decomposes it exactly: a (score → Σtokens) table (≤ 1001 rows,
    map-side partials) yields the boundary score and its remaining
    budget; every doc above the boundary is kept by a broadcast-joined
    filter, and only the ONE boundary score group runs a cumulative
    window (partitioned on the score value; its size is the score tie
    class, not the corpus). Equality with the naive definition is exact:
    inclusive_cum(doc) = tokens_above(score) + within-group inclusive
    cumsum."""
    from pyspark.sql import Window

    scored = _stopword_scored(docs, id_col, text_col, stopwords)
    per_score = scored.groupBy("score").agg(
        F.sum("n_tokens").alias("tok")
    )
    # ≤1001 rows: the descending cumulative runs on a single tiny task
    wdesc = (
        Window.orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cuts = per_score.withColumn("cum", F.sum("tok").over(wdesc)).withColumn(
        "above", F.col("cum") - F.col("tok")
    )
    total = per_score.agg(F.sum("tok").alias("total"))
    # one row always: (budget B, boundary score or null, budget left at
    # the boundary). The boundary is the unique score whose cumulative
    # crosses B; null when the whole corpus fits.
    cut = (
        cuts.crossJoin(F.broadcast(total))
        .withColumn("b", F.expr(f"total * {budget_permille} div 1000"))
        .agg(
            F.min(
                F.when(
                    (F.col("above") <= F.col("b")) & (F.col("cum") > F.col("b")),
                    F.col("score"),
                )
            ).alias("cutoff"),
            F.min(
                F.when(
                    (F.col("above") <= F.col("b")) & (F.col("cum") > F.col("b")),
                    F.col("b") - F.col("above"),
                )
            ).alias("left_at_cut"),
            F.min("b").alias("b"),
        )
    )
    sc = scored.crossJoin(F.broadcast(cut))
    kept_full = sc.filter(
        F.col("score") > F.coalesce(F.col("cutoff"), F.lit(-1))
    )
    wcut = (
        Window.partitionBy("score")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_partial = (
        sc.filter(F.col("score") == F.col("cutoff"))
        .withColumn("run", F.sum("n_tokens").over(wcut))
        .filter(F.col("run") <= F.col("left_at_cut"))
    )
    out_cols = [
        F.col(id_col),
        F.col("score"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    ]
    return kept_full.select(*out_cols).unionByName(
        kept_partial.select(*out_cols)
    )


def source_overlap_matrix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    num: int = 4,
    den: int = 5,
) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs (MinHash-LSH +
    exact verify) aggregated by unordered source pair → (source_a,
    source_b, n_pairs). This is the diagnostic a multi-crawl pipeline
    reads before choosing mixture weights: which sources are re-crawls
    of each other, and how much of a source is internal duplication
    (the diagonal). Pair volume is the near-dup set — tiny relative to
    the corpus — so the source labels join onto ids only and the matrix
    agg is trivially map-side-combinable."""
    pairs = D.minhash_lsh_pairs(docs, id_col, text_col, num=num, den=den)
    s = docs.select(F.col(id_col), F.col(source_col).alias("__src"))
    labeled = (
        pairs.select("doc_a", "doc_b")
        .join(
            s.select(
                F.col(id_col).alias("doc_a"), F.col("__src").alias("sa")
            ),
            "doc_a",
        )
        .join(
            s.select(
                F.col(id_col).alias("doc_b"), F.col("__src").alias("sb")
            ),
            "doc_b",
        )
    )
    return (
        labeled.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def vocab_oov_stats(
    docs: DataFrame,
    vocab_size: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequency-based vocabulary construction + per-document OOV rate:
    vocab = the `vocab_size` tokens with the highest document frequency
    (ties by term asc), then per document count token OCCURRENCES outside
    the vocab → (doc_id, n_tokens, n_oov, oov_permille). Zero-token docs
    produce no row. The tokenizer-coverage diagnostic run before fixing
    a subword vocab.

    Scale shape: document frequencies shuffle once on the term key
    (map-side partials over (doc, term)-distinct rows); the top-V rank
    sorts the VOCABULARY table, never the corpus, and the chosen vocab
    (V rows) broadcasts into the per-token membership probe, so the
    corpus-side pass is a narrow projection + broadcast semi-probe with
    one final per-doc aggregation."""
    from pyspark.sql import Window

    terms = docs.select(
        F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("term")
    )
    df_tbl = (
        terms.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    vocab = (
        df_tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= vocab_size)
        .select("term")
    )
    flagged = terms.join(
        F.broadcast(vocab.withColumn("in_v", F.lit(1))), "term", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_v").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
        .withColumn("oov_permille", F.expr("n_oov * 1000 div n_tokens"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k distinguishing terms per document by a tf/df score
    (tf·idf with idf = 1/df; the log-free form keeps the ranking
    integer-exact so both engines agree bitwise): score =
    (tf × 1,000,000) div df, ranked (score desc, term asc).

    Distributed shape: term counts shuffle once on (doc, term), document
    frequencies are a rollup of that same relation joined back on the
    term key, and the final top-k window partitions by document —
    per-partition state is one document's vocabulary, never the corpus.
    """
    terms = docs.select(
        F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_tbl, "term").withColumn(
        "score", F.expr("tf * 1000000 div df")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tf", "df", "score")
    )


def hashed_ngram_importance(
    docs: DataFrame,
    target_filter,
    n_buckets: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data-selection scoring over hashed bigram features
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling" — the hashed-ngram feature space, with the log-ratio
    replaced by the linear target-minus-raw form so the score is
    integer-exact and oracle-checkable; the ranking it induces is the
    standard fastText-style linear importance score over the same
    features).

    Features: word bigrams hashed into `n_buckets` buckets with the
    portable 60-bit hash. The RAW distribution is the whole corpus, the
    TARGET distribution is `docs.filter(target_filter)`; both are
    bucket-probability vectors in integer ppm (1e6 × cnt div total).
    Per-document score = Σ_b n_b × (target_ppm_b − raw_ppm_b): positive
    ⇒ the doc's features look more like the target than the corpus.

    Output: (doc_id, n_grams, score). Documents with < 2 tokens have no
    bigram features and are absent (no evidence either way).

    Scale shape: the gram explode is scanned ONCE — the (doc, bucket)
    partial agg is materialized (doc×≤n_buckets rows, orders of
    magnitude below the gram volume) and BOTH the ≤n_buckets-row
    distribution dimension and the per-doc scores derive from it; the
    dimension broadcasts back. Nothing driver-side, no shuffle wider
    than the gram explode, and the same plan holds at any corpus size.
    """
    grams = (
        D._ensure_parallelism(docs)
        .withColumn("__target", F.coalesce(target_filter, F.lit(False)))
        .select(
            F.col(id_col).alias("doc_id"),
            "__target",
            T.tokens(F.col(text_col)).alias("t"),
        )
        .select(
            "doc_id",
            "__target",
            F.explode(T.shingles(F.col("t"), 2)).alias("g"),
        )
        .select(
            "doc_id",
            "__target",
            (T.portable_hash(F.col("g")) % n_buckets).alias("bucket"),
        )
    )
    # __target is a per-doc constant, so keying the agg by it keeps one
    # row per (doc, bucket); eager-checkpointing this table is what
    # makes the corpus scan single-pass (both consumers below would
    # otherwise recompute the explode through lineage)
    per_doc = (
        grams.groupBy("doc_id", "__target", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    dim = per_doc.groupBy("bucket").agg(
        F.sum("n").alias("s_cnt"),
        F.sum(F.when(F.col("__target"), F.col("n")).otherwise(0)).alias(
            "t_cnt"
        ),
    )
    # totals folded into the ≤n_buckets-row dim via an unpartitioned
    # window over that tiny relation (not over the gram table)
    dim = dim.select(
        "bucket",
        F.expr(
            "s_cnt * 1000000 div greatest(1, sum(s_cnt) over ())"
        ).alias("s_ppm"),
        F.expr(
            "t_cnt * 1000000 div greatest(1, sum(t_cnt) over ())"
        ).alias("t_ppm"),
    )
    return (
        per_doc.join(F.broadcast(dim), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n") * (F.col("t_ppm") - F.col("s_ppm"))).alias(
                "score"
            ),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty: the permille of a document's
    DISTINCT word n-grams whose global first occurrence (minimum doc_id
    over the corpus) is this document. The curation diagnostic for
    ordered ingestion — a crawl snapshot appended after an existing
    corpus scores near zero unless it brings genuinely new text, and
    the novelty curve over doc_id reveals where a dataset stops adding
    information (Lee et al. 2022's dedup analyses read this curve).

    Output: (doc_id, n_distinct_grams, n_novel, novelty_permille) for
    documents with ≥ n tokens.

    Scale shape: distinct hashed shingles shuffle once on the 8-byte
    gram hash; first-owners are a min-agg on that same key (map-side
    combinable, stays co-partitioned for the join back); the final agg
    shuffles on doc_id. No broadcast of anything corpus-sized, no
    skew beyond what AQE handles on hot grams.

    `pairs` feeds both the min-agg and the join, so lineage recomputes
    the explode — deliberately: an A/B with `.persist()` measured
    SLOWER at sf0.1 (1.19→1.58 s) AND at 10× data (1.97→2.68 s),
    because here both consumers read the FULL corpus-scale shingle set
    and the cache write+read costs more than re-running the codegen'd
    tokenize/explode (unlike the dedup verify pipelines, whose persisted
    sets are re-read selectively for candidates only).
    """
    pairs = D.hashed_shingle_sets(docs, id_col, text_col, n)
    first = pairs.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        pairs.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .withColumn(
            "novelty_permille",
            F.expr("n_novel * 1000 div n_distinct_grams"),
        )
    )
