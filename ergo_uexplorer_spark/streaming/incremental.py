"""Incremental chain sync (SURVEY §2.1 S7/S10, §2.3 C4-C5, C10).

The reference's periodic scheduler indexes new blocks into H2+MVStore
with per-block transactions and version-based rollback
(StreamScheduler.scala:25-64, MvStorage commit/rollbackTo). The Spark
shape is Structured Streaming over arriving block files with
`foreachBatch` applying the UTXO delta per micro-batch:

    utxo' = (utxo ∪ batch_outputs) ∖ batch_spent_inputs

On Delta-capable storage this is literally `MERGE INTO utxo` (insert
outputs / delete inputs) and `RESTORE VERSION AS OF` replaces
rollbackTo; this module implements the same contract on plain parquet
with versioned snapshot directories (state/utxo/v{n}) so the logic and
tests carry over unchanged — snapshot writes are atomic via
write-then-rename and old versions are retained for rollback (the
reference keeps 10 MVStore versions).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import normalize as N
from ..operators.utxo import spent_inputs
from ..sources.blocks import BLOCK_SCHEMA

KEEP_VERSIONS = 10  # MvStorage.scala:298


class UtxoState:
    """Versioned UTXO snapshots on plain parquet (Delta-MERGE stand-in)."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = os.path.join(state_dir, "utxo")
        os.makedirs(self.dir, exist_ok=True)

    def versions(self) -> list[int]:
        return sorted(
            int(d[1:]) for d in os.listdir(self.dir) if d.startswith("v")
        )

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def read(self, version: int | None = None) -> DataFrame | None:
        v = self.current_version() if version is None else version
        path = os.path.join(self.dir, f"v{v}")
        if v == 0 or not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    def commit(self, utxo_df: DataFrame) -> int:
        """Write the next version atomically (tmp + rename), prune old."""
        v = self.current_version() + 1
        tmp = os.path.join(self.dir, f".tmp_v{v}")
        utxo_df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, os.path.join(self.dir, f"v{v}"))
        for old in self.versions()[:-KEEP_VERSIONS]:
            shutil.rmtree(os.path.join(self.dir, f"v{old}"), ignore_errors=True)
        return v

    def rollback_to(self, version: int) -> None:
        """S10 rollbackTo(rev): drop newer versions (fork recovery)."""
        for v in self.versions():
            if v > version:
                shutil.rmtree(os.path.join(self.dir, f"v{v}"), ignore_errors=True)


UTXO_COLS = (
    "box_id",
    "tx_id",
    "block_id",
    "height",
    "creation_height",
    "value",
    "ergo_tree",
    "ergo_tree_hash",
    "ergo_tree_t8_hash",
    "address",
)


def apply_block_batch(state: UtxoState, raw_batch: DataFrame) -> int:
    """C4/C5 per-batch UTXO application: insert batch outputs, delete
    batch-spent boxes. Idempotence: re-applying the same batch yields the
    same snapshot (inserts are by box_id union-dedup, deletes repeat)."""
    out = N.outputs(raw_batch)
    trees = N.ergo_trees(out)
    new_boxes = N.boxes(out, trees).select(*UTXO_COLS)
    spent = spent_inputs(N.inputs(raw_batch)).select("box_id")
    prev = state.read()
    merged = (
        new_boxes
        if prev is None
        else prev.unionByName(new_boxes).dropDuplicates(["box_id"])
    )
    updated = merged.join(spent, "box_id", "left_anti")
    return state.commit(updated)


def incremental_sync(
    spark: SparkSession,
    blocks_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """C10: Structured Streaming over arriving block files; one UTXO
    version per micro-batch. `Trigger.AvailableNow` drains the backlog
    then stops (the batch-catchup mode); leave it False for continuous
    tailing of a node dump directory."""
    state = UtxoState(spark, state_dir)
    stream = spark.readStream.schema(BLOCK_SCHEMA).json(blocks_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_block_batch(state, batch_df)

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
