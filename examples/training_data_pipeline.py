"""End-to-end training-data curation pipeline — the LLM-pipeline
operators composed the way a data team would actually chain them.

    python examples/training_data_pipeline.py [sf_dir] [outdir]

Stages (each prints a one-line report):
  1. clean      — exact dedup + MinHash-LSH near-dup removal + quality gate
  2. decontam   — drop docs sharing 4-grams with the held-out eval slice
  3. floor      — per-source stopword-quality quantile floor (FineWeb-style)
  4. split      — deterministic hash split train/val/test
  5. budget     — greedy token-budget selection on the train split
  6. tokenizer  — distributed BPE merge training on the selected corpus
  7. pack       — sequence packing into 512-token context windows
  8. drift      — PSI sufficient stats: selected-vs-dropped length drift
  9. ann        — embedding near-dup screen (IVF-free brute force at this SF)
 10. write      — curated parquet out

Everything is the library operators — no logic lives in this script.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ergo_uexplorer_spark.operators.bpe import (  # noqa: E402
    bpe_segment,
    train_bpe_merges,
    word_frequencies,
)
from ergo_uexplorer_spark.operators.corpus import (  # noqa: E402
    clean_corpus,
    decontaminate,
    quality_floor_filter,
    token_budget_select,
)
from ergo_uexplorer_spark.operators.curation import (  # noqa: E402
    deterministic_split,
    sequence_packing,
)
from ergo_uexplorer_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
)
from ergo_uexplorer_spark.operators.stats import (  # noqa: E402
    psi_sufficient_stats,
    psi_value,
)
from ergo_uexplorer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated-"
    )
    spark = get_spark("training-data-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = docs.count()
    print(f"[0] corpus: {n0} docs")

    # 1. exact + near-dup + minimum-length gate (one composed operator)
    kept = clean_corpus(docs, min_tokens=10)
    docs1 = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    print(f"[1] clean: {docs1.count()} docs survive dedup+quality")

    # 2. decontamination — last 5% of doc ids stand in for the eval set
    cut = int(docs.agg(F.max("doc_id")).first()[0] * 0.95)
    contaminated = decontaminate(docs1, F.col("doc_id") > cut, n=4)
    docs2 = (
        docs1.filter(F.col("doc_id") <= cut)
        .join(contaminated.select("doc_id"), "doc_id", "left_anti")
    )
    print(
        f"[2] decontam: dropped {contaminated.count()} overlapping docs"
        f" -> {docs2.count()}"
    )

    # 3. per-source quality floor (drop each source's worst quarter)
    floored = quality_floor_filter(docs2, q_num=1, q_den=4)
    docs3 = docs2.join(floored.select("doc_id"), "doc_id", "left_semi")
    print(f"[3] floor: {docs3.count()} docs at/above their source floor")

    # 4. deterministic split
    split = deterministic_split(docs3)
    per = {r["split"]: r["n"] for r in split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    print(f"[4] split: {per}")
    train = split.filter(F.col("split") == "train").drop("split")

    # 5. token-budget selection: best 60% of train tokens
    selected = token_budget_select(train, budget_permille=600)
    train_sel = train.join(selected.select("doc_id"), "doc_id", "left_semi")
    print(
        f"[5] budget: kept {selected.count()} docs, "
        f"{selected.agg(F.sum('n_tokens')).first()[0]} tokens"
    )

    # 6. BPE tokenizer training on the SELECTED corpus
    merges_df = train_bpe_merges(train_sel, n_merges=12)
    merges = [
        (r.left, r.right) for r in merges_df.orderBy("rank").collect()
    ]
    print(f"[6] tokenizer: 12 merges, first 5 = {merges[:5]}")
    pieces = bpe_segment(word_frequencies(train_sel), "w", merges)
    n_pieces = pieces.select(
        F.sum(F.size("pieces") * F.col("cnt"))
    ).first()[0]
    print(f"    corpus BPE pieces: {n_pieces}")

    # 7. sequence packing into 512-token windows
    packed = sequence_packing(train_sel, window_tokens=512, n_shards=8)
    n_windows = packed.agg(
        F.count_distinct(F.struct("shard", "pack_id"))
    ).first()[0]
    print(f"[7] pack: {n_windows} windows of 512 tokens")

    # 8. drift check: PSI between selected and dropped length profiles
    tagged = train.join(
        selected.select("doc_id"), "doc_id", "left_semi"
    ).withColumn("grp", F.lit("sel")).unionByName(
        train.join(
            selected.select("doc_id"), "doc_id", "left_anti"
        ).withColumn("grp", F.lit("drop"))
    ).select((F.col("n_chars") / 50).cast("long").alias("bucket"), "grp")
    drift = psi_sufficient_stats(tagged, "bucket", "grp", "sel", "drop")
    print(f"[8] drift: PSI(selected, dropped) = {psi_value(drift):.3f}")

    # 9. embedding near-dup screen over the curated ids
    probes = emb.limit(16)
    nn = brute_force_topk(emb, probes, k=2)
    print(f"[9] ann: {nn.count()} neighbor rows for 16 probes")

    # 10. write the curated training corpus
    (
        docs.join(train_sel.select("doc_id"), "doc_id", "left_semi")
        .write.mode("overwrite")
        .parquet(f"{outdir}/train_curated.parquet")
    )
    print(f"[10] wrote curated train split -> {outdir}/train_curated.parquet")


if __name__ == "__main__":
    main()
