"""BPE merge training vs a pure-python Sennrich-style reference:
identical merge sequence (including ties), identical gains, and
identical final segmentation via bpe_segment."""

from __future__ import annotations

import random
import re

from ergo_uexplorer_spark.operators.bpe import (
    bpe_segment,
    train_bpe_merges,
    word_frequencies,
)

TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _ref_word_freq(texts):
    freq = {}
    for t in texts:
        for w in TOKEN_RE.split(t.lower()):
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def _ref_merge(symbols, pair):
    out, i = [], 0
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == pair[0]
            and symbols[i + 1] == pair[1]
        ):
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def _ref_train(texts, n_merges):
    freq = _ref_word_freq(texts)
    state = {tuple(w): c for w, c in freq.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        gains = {}
        for syms, c in state.items():
            for a, b in zip(syms, syms[1:]):
                gains[(a, b)] = gains.get((a, b), 0) + c
        if not gains:
            break
        (a, b), g = min(
            gains.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, g))
        state = {}
        for syms, c in list(
            {s: c for s, c in _merge_all(a, b, freq, merges)}.items()
        ):
            state[syms] = c
    return merges


def _merge_all(a, b, freq, merges):
    for w, c in freq.items():
        syms = tuple(w)
        for _, l, r, _ in merges:
            syms = _ref_merge(syms, (l, r))
        yield syms, c


def _mk_texts(rng, n):
    words = ["banana", "bandana", "anaconda", "data", "spark", "parquet"]
    return [
        " ".join(rng.choices(words, k=rng.randrange(2, 12)))
        for _ in range(n)
    ]


def test_bpe_merges_match_reference(spark):
    rng = random.Random(7)
    texts = _mk_texts(rng, 120)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.rank, r.left, r.right, r.gain)
        for r in train_bpe_merges(df, n_merges=12).orderBy("rank").collect()
    ]
    want = _ref_train(texts, 12)
    assert got == want
    assert len(got) == 12


def test_bpe_ltr_nonoverlapping_merge(spark):
    # 'aaa': pair (a,a) merges left-to-right → ['aa', 'a'], so the
    # second merge round sees ('aa','a'), not ('a','aa')
    df = spark.createDataFrame([("aaa aaa aaa",)], "text string")
    got = [
        (r.rank, r.left, r.right)
        for r in train_bpe_merges(df, n_merges=2).orderBy("rank").collect()
    ]
    assert got == [(1, "a", "a"), (2, "aa", "a")]


def test_bpe_segment_applies_merges(spark):
    rng = random.Random(11)
    texts = _mk_texts(rng, 80)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = [
        (r.left, r.right)
        for r in train_bpe_merges(df, n_merges=8).orderBy("rank").collect()
    ]
    words = word_frequencies(df)
    seg = {
        r.w: tuple(r.pieces)
        for r in bpe_segment(words, "w", merges).collect()
    }
    for w, pieces in seg.items():
        # pieces reassemble the word and each piece is merge-derived
        assert "".join(pieces) == w
        ref = tuple(w)
        for pair in merges:
            ref = _ref_merge(ref, pair)
        assert pieces == ref, w


def test_bpe_batched_equals_sequential(spark):
    """batch=B is exact: the provably-safe prefix selection yields the
    SAME (rank, left, right, gain) table as one-merge-per-round — on
    the reference-style corpus, the pinned Sennrich shape, and the
    adversarial overlap case ('aaa', where created pairs outrank
    remaining candidates and the batch must stop at width 1)."""
    rng = random.Random(21)
    cases = [
        _mk_texts(rng, 120),
        ["low lower newest widest " * 10],
        ["aaa aaa aaa", "abab abab"],
    ]
    for texts in cases:
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        seq = [
            (r.rank, r.left, r.right, r.gain)
            for r in train_bpe_merges(df, n_merges=10)
            .orderBy("rank")
            .collect()
        ]
        for b in (4, 10):
            bat = [
                (r.rank, r.left, r.right, r.gain)
                for r in train_bpe_merges(df, n_merges=10, batch=b)
                .orderBy("rank")
                .collect()
            ]
            assert bat == seq, f"batch={b} diverged on {texts[:1]}"


def test_bpe_batch_takes_disjoint_prefix(spark):
    """When the top candidates are symbol-disjoint and cannot create a
    competitive pair (length-2 words → no trigrams → bounds 0), one
    batch round takes them ALL — the economics the flag exists for.
    Conversely on an overlap-heavy corpus the guard degrades to width 1
    rather than diverging (covered by the equivalence test's 'aaa'
    case)."""
    import pyspark.sql.functions as F

    from ergo_uexplorer_spark.operators.bpe import (
        _created_pair_bounds,
        _initial_state,
        _pair_gains,
        _select_batch,
        word_frequencies,
    )

    texts = ["ab " * 9 + "cd " * 7 + "ef " * 5 + "gh " * 3]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    state = _initial_state(word_frequencies(df))
    cands = (
        _pair_gains(state)
        .orderBy(F.desc("gain"), F.asc("l"), F.asc("r"))
        .limit(4)
        .collect()
    )
    bounds = _created_pair_bounds(state, cands)
    taken = _select_batch(cands, bounds, 4)
    assert [(c.l, c.r) for c in taken] == [
        ("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")
    ]
    # and the whole vocabulary trains in ONE batched round's worth of
    # merges, identical to sequential
    seq = [
        (r.rank, r.left, r.right, r.gain)
        for r in train_bpe_merges(df, n_merges=4).orderBy("rank").collect()
    ]
    bat = [
        (r.rank, r.left, r.right, r.gain)
        for r in train_bpe_merges(df, n_merges=4, batch=4)
        .orderBy("rank")
        .collect()
    ]
    assert bat == seq

