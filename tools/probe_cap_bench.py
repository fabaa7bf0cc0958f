"""Size `probe_cap` by measurement (r11 VERDICT #2).

The interactive-serving probe paths (`select_boxes(probe_ids=True)` /
`boxes_with_assets(probe_ids=True)`) collect up to `probe_cap` ids into
the driver and push them into the scan as an IN-literal filter —
bucket-pruning to 1/N of the files on the bucketed layouts — falling
back to the semi-join past the cap. r11 shipped the cap at a
round-number 100_000; a worst-case probe at that size builds a ~6 MB
In-filter plan. This tool measures, at the 1.9M-utxo anchor
(`tools/scale_chain_bench.py` fixture, reused), the IN-literal probe
against the semi-join fallback at id-list sizes 1k..100k on:

  - the box_id-BUCKETED boxes table read from DISK (the layout the
    probe exists for — bucket pruning), and
  - the in-memory cached boxes table (the serving-cache posture,
    where the probe's only win is skipping the build side).

Prints one JSON line; the knee goes to SCALE.md and the new
`probe_cap` default. Usage: python tools/probe_cap_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_chain_bench import FIXTURE_DIR, build_fixture  # noqa: E402

SIZES = [1_000, 5_000, 10_000, 20_000, 50_000, 100_000]


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ergo_uexplorer_spark.pipeline import ingest_blocks
    from ergo_uexplorer_spark.storage import write_bucketed

    build_fixture()
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(FIXTURE_DIR, "..", "chain_warehouse"),
        )
        .getOrCreate()
    )
    tables = ingest_blocks(spark, FIXTURE_DIR, cache="raw")
    boxes_mem = tables["boxes_main"].persist()
    n_boxes = boxes_mem.count()
    utxo = tables["utxo"].persist()
    utxo.count()
    tables["raw"].unpersist(blocking=False)
    print(f"boxes: {n_boxes:,}", flush=True)

    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS boxes_by_box")
    shutil.rmtree(os.path.join(wh, "boxes_by_box"), ignore_errors=True)
    write_bucketed(boxes_mem, "boxes_by_box", keys=("box_id",))
    boxes_disk = spark.table("boxes_by_box")

    all_ids = [
        r["box_id"] for r in utxo.select("box_id").limit(max(SIZES)).collect()
    ]

    def timed(fn):
        best = None
        for _ in range(3):
            t = time.time()
            fn()
            dt = time.time() - t
            best = dt if best is None or dt < best else best
        return round(best, 3)

    out: dict = {"n_boxes": n_boxes}
    for layout, boxes in (("disk_bucketed", boxes_disk), ("mem", boxes_mem)):
        for n in SIZES:
            ids = all_ids[:n]
            out[f"in_literal[{layout}][{n}]"] = timed(
                lambda: boxes.filter(F.col("box_id").isin(ids)).collect()
            )
            ids_df = spark.createDataFrame(
                [(i,) for i in ids], "box_id string"
            )
            out[f"semi_join[{layout}][{n}]"] = timed(
                lambda: boxes.join(
                    ids_df, "box_id", "left_semi"
                ).collect()
            )
            print(
                f"  {layout} n={n}: in_literal="
                f"{out[f'in_literal[{layout}][{n}]']}s semi_join="
                f"{out[f'semi_join[{layout}][{n}]']}s",
                flush=True,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
