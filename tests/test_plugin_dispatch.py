"""C12 plugin dispatch: the mempool stream drives an analytics plugin
(the high-value detector) per micro-batch via foreachBatch — the Spark
form of PluginManager.executePlugins (plugin/PluginManager.scala:19-49)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ergo_uexplorer_spark.fixtures.chaingen import ChainGen
from ergo_uexplorer_spark.sources.blocks import TX_SCHEMA


def test_mempool_plugin_dispatch(spark, tmp_path):
    gen = ChainGen(seed=17)
    gen.generate(40)
    txs = [t for b in gen.blocks[5:] for t in b["transactions"] if t["inputs"]]
    snap_dir = tmp_path / "snaps"
    snap_dir.mkdir()
    for i in range(3):
        with open(snap_dir / f"s{i}.json", "w") as f:
            for t in txs[i * 10 : (i + 1) * 10 + 5]:  # overlapping snapshots
                f.write(json.dumps(t, separators=(",", ":")) + "\n")

    # plugin: flag txs whose total output value >= threshold
    alerts: list[tuple[str, int]] = []
    threshold = 50 * 10**9

    def high_value_plugin(batch_df, batch_id):
        flagged = (
            batch_df.withColumn(
                "total_out",
                F.aggregate(
                    F.col("outputs"),
                    F.lit(0).cast("long"),
                    lambda acc, o: acc + o["value"],
                ),
            )
            .filter(F.col("total_out") >= threshold)
            .select("id", "total_out")
            .collect()
        )
        alerts.extend((r["id"], r["total_out"]) for r in flagged)

    stream = (
        spark.readStream.schema(TX_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(snap_dir))
        .dropDuplicates(["id"])
    )
    q = (
        stream.writeStream.foreachBatch(high_value_plugin)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)

    # plugin saw each qualifying tx exactly once despite snapshot overlap
    ids = [a[0] for a in alerts]
    assert len(ids) == len(set(ids))
    seen = {t["id"] for t in txs[:35]}
    expected = {
        t["id"]
        for t in txs[:35]
        if sum(o["value"] for o in t["outputs"]) >= threshold
    }
    assert set(ids) == expected
    assert len(expected) > 0
