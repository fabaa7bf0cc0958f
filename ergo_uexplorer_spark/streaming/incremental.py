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
with versioned DELTA directories (state/utxo/v{n}/{created,spent}) —
each commit writes O(batch) rows, a periodic compaction materializes a
full base snapshot, and reads reconstruct base ∪ deltas ∖ spends. Delta
writes are atomic via write-then-rename and old versions are retained
for rollback (the reference keeps 10 MVStore versions).
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
COMPACT_EVERY = 10  # BlockWriter.scala:79-83 compaction cadence analog


class UtxoState:
    """Versioned UTXO state on plain parquet with **per-batch delta
    commits**: each version directory holds only the batch's `created/`
    rows and `spent/` box-ids — write volume is O(batch), never
    O(state). Every `compact_every`-th commit additionally materializes
    a full `base/` snapshot (the MVStore `compactFile` / Delta OPTIMIZE
    analog), so reads reconstruct from the newest base plus a bounded
    delta chain:

        state(v) = (base(b) ∪ created(b+1..v)) ∖ spent(b+1..v)

    Commits are atomic (tmp dir + rename); a crash between the rename
    and the base write only lengthens the delta chain, never corrupts.
    Rollback (S10 rollbackTo) drops newer version dirs; pruning removes
    only versions older than a base that the retained window no longer
    needs. On Delta-capable storage the whole class collapses to
    `MERGE INTO utxo` + `RESTORE VERSION AS OF`.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        compact_every: int = COMPACT_EVERY,
        keep_versions: int = KEEP_VERSIONS,
    ):
        self.spark = spark
        self.dir = os.path.join(state_dir, "utxo")
        self.compact_every = compact_every
        self.keep_versions = keep_versions
        os.makedirs(self.dir, exist_ok=True)

    def _vdir(self, v: int) -> str:
        return os.path.join(self.dir, f"v{v}")

    def _has_base(self, v: int) -> bool:
        return os.path.exists(os.path.join(self._vdir(v), "base"))

    def versions(self) -> list[int]:
        return sorted(
            int(d[1:]) for d in os.listdir(self.dir) if d.startswith("v")
        )

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def read(self, version: int | None = None) -> DataFrame | None:
        """Reconstruct the UTXO set at `version` from the newest base at
        or below it plus the (≤ compact_every + keep_versions) deltas
        above — a union + one anti-join, distributed end to end."""
        v = self.current_version() if version is None else version
        vs = [x for x in self.versions() if x <= v]
        if not vs:
            return None
        bases = [x for x in vs if self._has_base(x)]
        b = max(bases) if bases else 0
        created_dirs = [
            os.path.join(self._vdir(x), "created") for x in vs if x > b
        ]
        spent_dirs = [os.path.join(self._vdir(x), "spent") for x in vs if x > b]
        base_df = (
            self.spark.read.parquet(os.path.join(self._vdir(b), "base"))
            if b
            else None
        )
        if not created_dirs:
            return base_df
        created = self.spark.read.parquet(*created_dirs)
        merged = (
            created if base_df is None else base_df.unionByName(created)
        ).dropDuplicates(["box_id"])
        spent = self.spark.read.parquet(*spent_dirs).select("box_id")
        return merged.join(spent, "box_id", "left_anti")

    def batch_version(self, batch_id: int) -> int | None:
        """Version already published for a streaming batch id, if any."""
        for v in self.versions():
            marker = os.path.join(self._vdir(v), "_batch_id")
            if os.path.exists(marker):
                with open(marker) as f:
                    if f.read().strip() == str(batch_id):
                        return v
        return None

    def commit(
        self,
        created: DataFrame,
        spent: DataFrame,
        batch_id: int | None = None,
    ) -> int:
        """O(batch) delta commit: write the batch's created rows and
        spent box-ids, atomically publish the version, then (on the
        compaction cadence) materialize the full snapshot and prune
        deltas the retained window no longer needs.

        `batch_id` makes the commit EXACTLY-ONCE under foreachBatch
        redelivery: Structured Streaming re-runs the last micro-batch
        after a crash between the sink write and the checkpoint commit,
        so the batch id is recorded inside the version dir (same atomic
        rename) and a replay returns the already-published version
        instead of double-applying (the reference gets this from
        MVStore's transactional per-block commit)."""
        if batch_id is not None:
            existing = self.batch_version(batch_id)
            if existing is not None:
                return existing
        v = self.current_version() + 1
        tmp = os.path.join(self.dir, f".tmp_v{v}")
        created.write.mode("overwrite").parquet(os.path.join(tmp, "created"))
        spent.select("box_id").write.mode("overwrite").parquet(
            os.path.join(tmp, "spent")
        )
        if batch_id is not None:
            with open(os.path.join(tmp, "_batch_id"), "w") as f:
                f.write(str(batch_id))
        os.rename(tmp, self._vdir(v))
        if self.compact_every and v % self.compact_every == 0:
            tmp_base = os.path.join(self._vdir(v), ".tmp_base")
            self.read(v).write.mode("overwrite").parquet(tmp_base)
            os.rename(tmp_base, os.path.join(self._vdir(v), "base"))
        self._prune(v)
        return v

    def _prune(self, current: int) -> None:
        """Drop versions strictly older than the newest base that still
        covers the whole retained rollback window."""
        window_lo = current - self.keep_versions + 1
        bases = [
            x for x in self.versions() if self._has_base(x) and x <= window_lo
        ]
        if not bases:
            return
        cutoff = max(bases)
        for old in self.versions():
            if old < cutoff:
                shutil.rmtree(self._vdir(old), ignore_errors=True)

    def rollback_to(self, version: int) -> None:
        """S10 rollbackTo(rev): drop newer versions (fork recovery)."""
        for v in self.versions():
            if v > version:
                shutil.rmtree(self._vdir(v), ignore_errors=True)


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


def apply_block_batch(
    state: UtxoState, raw_batch: DataFrame, batch_id: int | None = None
) -> int:
    """C4/C5 per-batch UTXO application as a pure DELTA: the commit
    writes only this batch's outputs and spent ids (O(batch) I/O —
    MvStorage's per-block commit contract, never a full-state rewrite).
    Idempotence: re-applying the same content re-writes the same delta
    and reconstruction union-dedups by box_id; passing the streaming
    `batch_id` upgrades that to exactly-once (no duplicate version on
    foreachBatch redelivery)."""
    out = N.outputs(raw_batch)
    trees = N.ergo_trees(out)
    new_boxes = N.boxes(out, trees).select(*UTXO_COLS)
    spent = spent_inputs(N.inputs(raw_batch)).select("box_id")
    return state.commit(new_boxes, spent, batch_id=batch_id)


def incremental_sync(
    spark: SparkSession,
    blocks_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    state: "UtxoState | None" = None,
):
    """C10: Structured Streaming over arriving block files; one UTXO
    version per micro-batch. `Trigger.AvailableNow` drains the backlog
    then stops (the batch-catchup mode); leave it False for continuous
    tailing of a node dump directory. Pass `state` to run against a
    different versioned backend (e.g. `delta_state.DeltaUtxoState`)."""
    state = state or UtxoState(spark, state_dir)
    stream = spark.readStream.schema(BLOCK_SCHEMA).json(blocks_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_block_batch(state, batch_df, batch_id=batch_id)

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
