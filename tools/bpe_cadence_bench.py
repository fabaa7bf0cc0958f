"""BPE word-table checkpoint cadence sweep (r11 VERDICT #4).

`train_bpe_merges` localCheckpoints the word table every
`checkpoint_every` rounds; the default (4) was tuned on character-level
early rounds where each round applies ONE merge. In the diversified
regime a batched round applies up to `batch` merges as nested
`F.replace` columns, so the un-truncated lineage grows `batch`× faster
per round — the cadence that amortizes checkpoint cost against plan
growth may differ. This sweep runs cadence ∈ {1, 2, 4, 8} at batch=16
on the 10× word table (.scale/sf1 documents — the SCALE.md BPE bench
corpus) over a 128-merge AND a 256-merge window, so the marginal
(256−128) window isolates the diversified regime (early char-level
rounds are shared between the two windows).

Prints one JSON line; results go to SCALE.md's BPE section.
Usage: python tools/bpe_cadence_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "sf1")
CADENCES = [1, 2, 4, 8]
BATCH = 16


def main() -> None:
    from ergo_uexplorer_spark.operators.bpe import train_bpe_merges
    from ergo_uexplorer_spark.session import get_spark

    spark = get_spark("bpe-cadence")
    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet")).persist()
    docs.count()

    out: dict = {}
    # warm once (JIT + shuffle machinery) outside the measurement
    train_bpe_merges(docs, n_merges=16, batch=BATCH)
    for cadence in CADENCES:
        for n in (128, 256):
            stats: dict = {}
            t0 = time.time()
            m = train_bpe_merges(
                docs,
                n_merges=n,
                batch=BATCH,
                checkpoint_every=cadence,
                stats=stats,
            )
            cnt = m.count()
            dt = round(time.time() - t0, 2)
            out[f"cadence{cadence}_n{n}"] = {
                "total_s": dt,
                "rounds": stats["rounds"],
                "merges": cnt,
            }
            print(
                f"  cadence={cadence} n={n}: {dt}s "
                f"rounds={stats['rounds']}",
                flush=True,
            )
        a = out[f"cadence{cadence}_n128"]
        b = out[f"cadence{cadence}_n256"]
        marg = round((b["total_s"] - a["total_s"]) / 128, 4)
        out[f"cadence{cadence}_marginal_s_per_merge"] = marg
        print(f"  cadence={cadence}: diversified marginal {marg}s/merge",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
