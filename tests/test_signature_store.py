"""Signature store: persisted base-corpus dedup artifacts must screen
identically to the inline incremental_dedup derivation, support
idempotent per-batch appends, and refuse incompatible configurations."""

from __future__ import annotations

import pytest

from ergo_uexplorer_spark.operators.dedup import incremental_dedup
from ergo_uexplorer_spark.operators.sigstore import (
    incremental_dedup_from_store,
    write_signature_store,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def corpus(spark):
    base_text = " ".join(f"w{i}" for i in range(200))
    other_text = " ".join(f"v{i}" for i in range(150))
    base1 = _docs(
        spark,
        [(100, base_text)]
        + [(110 + i, " ".join(f"b{i}_{j}" for j in range(60))) for i in range(4)],
    )
    base2 = _docs(spark, [(200, other_text)])
    new = _docs(
        spark,
        [
            (1, base_text.replace("w100", "q100")),  # near-dup of base 100
            (2, other_text.replace("v3", "u3")),  # near-dup of base 200
            (3, " ".join(f"n3_{j}" for j in range(60))),  # fresh
        ],
    )
    return base1, base2, new


def _decisions(df):
    return {r["doc_id"]: (r["dup_of"], r["keep"]) for r in df.collect()}


def test_store_matches_inline_incremental(spark, tmp_path, corpus):
    base1, base2, new = corpus
    path = str(tmp_path / "store")
    write_signature_store(base1, path)
    got = _decisions(incremental_dedup_from_store(new, path))
    want = _decisions(incremental_dedup(new, base1))
    assert got == want
    assert got[1] == (100, False) and got[3] == (None, True)


def test_store_append_batches(spark, tmp_path, corpus):
    base1, base2, new = corpus
    path = str(tmp_path / "store")
    write_signature_store(base1, path)
    write_signature_store(base2, path, batch="b2")
    got = _decisions(incremental_dedup_from_store(new, path))
    want = _decisions(incremental_dedup(new, base1.unionByName(base2)))
    assert got == want
    assert got[2] == (200, False)
    # redelivery of batch b2: same directory overwritten, same answer
    write_signature_store(base2, path, batch="b2")
    assert _decisions(incremental_dedup_from_store(new, path)) == want
    # exclude_batch screens against exactly the pre-b2 base
    got_excl = _decisions(
        incremental_dedup_from_store(new, path, exclude_batch="b2")
    )
    assert got_excl == _decisions(incremental_dedup(new, base1))


def test_store_rejects_config_mismatch(spark, tmp_path, corpus):
    base1, _, _ = corpus
    path = str(tmp_path / "store")
    write_signature_store(base1, path, n=3)
    with pytest.raises(ValueError, match="signature store"):
        write_signature_store(base1, path, batch="x", n=4)
    with pytest.raises(ValueError, match="no signature store"):
        incremental_dedup_from_store(base1, str(tmp_path / "missing"))


def test_store_all_novel_batch(spark, tmp_path, corpus):
    """A batch with zero band collisions takes the no-candidate fast
    path and keeps everything."""
    base1, _, _ = corpus
    path = str(tmp_path / "store")
    write_signature_store(base1, path)
    fresh = _docs(
        spark, [(7, " ".join(f"z7_{j}" for j in range(60)))]
    )
    got = _decisions(incremental_dedup_from_store(fresh, path))
    assert got == {7: (None, True)}


def test_corpus_refresh_store_mode_matches_inline(spark, tmp_path):
    """Store-backed process_batch (signatures read from and appended to
    the store at accept time) must commit the same base corpus and the
    same decisions as the inline mode, batch after batch — including
    cross-batch screening (doc accepted in batch 0 catches a near-dup
    in batch 1) and redelivery idempotency."""
    from ergo_uexplorer_spark.streaming.corpus_refresh import (
        process_batch,
        read_base,
        seed_base,
    )

    text_a = " ".join(f"a{i}" for i in range(120))
    text_b = " ".join(f"b{i}" for i in range(120))
    seed = _docs(spark, [(100, text_a)])
    b0 = _docs(
        spark, [(1, text_a.replace("a50", "q50")), (2, text_b)]
    )
    b1 = _docs(
        spark,
        [
            (3, text_b.replace("b50", "q50")),  # near-dup of batch-0 doc 2
            (4, " ".join(f"c{j}" for j in range(120))),
        ],
    )

    def run(mode_store: bool):
        tag = "s" if mode_store else "i"
        base_path = str(tmp_path / f"base_{tag}")
        store = str(tmp_path / f"store_{tag}") if mode_store else None
        dec = str(tmp_path / f"dec_{tag}")
        seed_base(seed, base_path, store_path=store)
        process_batch(b0, 0, base_path, decisions_path=dec, store_path=store)
        process_batch(b1, 1, base_path, decisions_path=dec, store_path=store)
        if mode_store:  # redelivery of batch 1 must be a no-op rewrite
            process_batch(
                b1, 1, base_path, decisions_path=dec, store_path=store
            )
        ids = {r["doc_id"] for r in read_base(spark, base_path).collect()}
        decs = {
            r["doc_id"]: (r["dup_of"], r["keep"])
            for r in spark.read.parquet(dec).collect()
        }
        return ids, decs

    ids_inline, dec_inline = run(False)
    ids_store, dec_store = run(True)
    assert ids_store == ids_inline == {100, 2, 4}
    assert dec_store == dec_inline
    assert dec_store[3] == (2, False)  # cross-batch dup caught via store


def test_corpus_refresh_store_mode_unseeded_first_batch(spark, tmp_path):
    """Store mode without a seed: the first batch is accepted whole
    (no meta yet), its store write creates the meta, and redelivery of
    that same first batch — whose own partition is now the ONLY store
    content — excludes it and still accepts everything."""
    from ergo_uexplorer_spark.streaming.corpus_refresh import (
        process_batch,
        read_base,
    )

    base_path = str(tmp_path / "base")
    store = str(tmp_path / "store")
    b0 = _docs(
        spark,
        [
            (1, " ".join(f"a{i}" for i in range(120))),
            (2, " ".join(f"b{i}" for i in range(120))),
        ],
    )
    process_batch(b0, 0, base_path, store_path=store)
    first = {r["doc_id"] for r in read_base(spark, base_path).collect()}
    assert first == {1, 2}
    process_batch(b0, 0, base_path, store_path=store)  # redelivery
    assert {r["doc_id"] for r in read_base(spark, base_path).collect()} == first


def test_store_append_adopts_meta_params(spark, tmp_path, corpus):
    """The accept-time append path (process_batch) never restates the
    seed's parameters — an append with defaults against a store seeded
    with non-default n must adopt the meta instead of raising."""
    base1, base2, _ = corpus
    path = str(tmp_path / "store")
    write_signature_store(base1, path, n=4)
    write_signature_store(base2, path, batch="b2")  # defaults: adopt n=4
    from ergo_uexplorer_spark.operators.sigstore import _read_meta

    assert _read_meta(spark, path)[0] == 4
    with pytest.raises(ValueError, match="signature store"):
        write_signature_store(base2, path, batch="b3", n=5)  # explicit clash
