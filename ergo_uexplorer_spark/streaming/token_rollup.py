"""Maintained top-K token rollup — q15b's 100 TB serving answer.

The r11 layout A/B (SCALE.md) measured both storage layouts LOSING to a
full scan for the hot top-tokens endpoint (flat 2.28 s, bucketed 3.17 s
from disk; 0.98 s from cache at the 1.9M-utxo anchor) and named the
real answer: don't scan the fact table at serve time at all — maintain
the aggregate incrementally as blocks arrive and serve top-K from the
token DIMENSION. The reference serves this from its Token/Asset2Box
tables, which its indexer maintains per block inside the same H2
transaction (BlockWriter.scala:35-77); this module is that contract on
the versioned-parquet state pattern `UtxoState` established.

Shape: one delta parquet per micro-batch, rows grouped by
(token_id, height) — `n_boxes` additivity across batches is exact
because a box is created whole in ONE block (its asset rows never span
batches) and box ids never repeat across blocks, so per-batch
`count_distinct(box_id)` partials sum to the global distinct count.
Height attribution makes a mid-version fork split exact (the same
`deltas_above` contract as UtxoState's spent rows). Reads reconstruct
base ∪ deltas with one tiny token-dim aggregation — O(tokens), never
O(assets) — and `top(k)` is the q15b endpoint. Exactly-once under
foreachBatch redelivery via the same `_batch_id` sidecar; rollback
drops version dirs.

Reference parity: `top(k)` ≡ `stats.top_tokens_by_box_count(assets, k)`
over the full assets table — pinned by a stream==batch equality test.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental import COMPACT_EVERY, KEEP_VERSIONS


class TokenStatsRollup:
    """Versioned incremental (token_id → n_boxes, total_amount) rollup
    on plain parquet: O(batch-tokens) delta commits, periodic compacted
    base, bounded reconstruction. See module docstring."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        compact_every: int = COMPACT_EVERY,
        keep_versions: int = KEEP_VERSIONS,
        serve_top_k: int = 100,
    ):
        self.spark = spark
        self.dir = os.path.join(state_dir, "token_stats")
        self.compact_every = compact_every
        self.keep_versions = keep_versions
        # the ANSWER is maintained, not just the aggregate: each commit
        # also writes the current top-`serve_top_k` rows as a sidecar,
        # so the hot endpoint is a ~100-row file scan (measured 0.44 s
        # for the read+agg path vs ≤0.1 s from the sidecar at the 1.9M
        # anchor — the agg path stays as the fallback and the source of
        # truth for k > serve_top_k). 0 disables the sidecar.
        self.serve_top_k = serve_top_k
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

    def batch_version(self, batch_id: int) -> int | None:
        for v in self.versions():
            marker = os.path.join(self._vdir(v), "_batch_id")
            if os.path.exists(marker):
                with open(marker) as f:
                    if f.read().strip() == str(batch_id):
                        return v
        return None

    def commit(
        self, batch_assets: DataFrame, batch_id: int | None = None
    ) -> int:
        """O(batch) delta commit: aggregate the batch's asset rows to
        (token_id, height) partials, publish atomically (tmp + rename),
        compact to a full base on the cadence, prune behind the
        retained window. Exactly-once via `batch_id` (foreachBatch
        re-runs the last micro-batch after a crash between sink write
        and checkpoint commit)."""
        if batch_id is not None:
            existing = self.batch_version(batch_id)
            if existing is not None:
                return existing
        delta = batch_assets.groupBy("token_id", "height").agg(
            F.count_distinct("box_id").alias("n_boxes"),
            F.sum("amount").alias("total_amount"),
        )
        v = self.current_version() + 1
        tmp = os.path.join(self.dir, f".tmp_v{v}")
        delta.write.mode("overwrite").parquet(os.path.join(tmp, "delta"))
        if batch_id is not None:
            with open(os.path.join(tmp, "_batch_id"), "w") as f:
                f.write(str(batch_id))
        os.rename(tmp, self._vdir(v))
        if self.compact_every and v % self.compact_every == 0:
            tmp_base = os.path.join(self._vdir(v), ".tmp_base")
            self.read(v).write.mode("overwrite").parquet(tmp_base)
            os.rename(tmp_base, os.path.join(self._vdir(v), "base"))
        if self.serve_top_k:
            from pyspark.sql import Window

            tmp_top = os.path.join(self._vdir(v), ".tmp_topk")
            order = [F.desc("n_boxes"), F.asc("token_id")]
            (
                self.read(v)
                .orderBy(*order)
                .limit(self.serve_top_k)
                # row_number over ≤ k rows: the rank column makes the
                # sidecar self-describing (parquet row order is not a
                # contract)
                .withColumn(
                    "rank", F.row_number().over(Window.orderBy(*order))
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp_top)
            )
            os.rename(tmp_top, os.path.join(self._vdir(v), "topk"))
        self._prune(v)
        return v

    def _prune(self, current: int) -> None:
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
        """S10 rollbackTo: drop newer versions (fork recovery). The
        caller rolling back `UtxoState` to a version must roll this
        rollup back to the version IT committed for the same batches —
        under `incremental_sync` the two advance in lockstep."""
        for v in self.versions():
            if v > version:
                shutil.rmtree(self._vdir(v), ignore_errors=True)

    def deltas_above(self, version: int, below_height: int) -> DataFrame:
        """The (token_id, height) partials of versions strictly above
        `version` restricted below the divergence height — the
        shared-ancestor slice a mid-version fork rollback preserves
        (UtxoState.deltas_above's contract). Eagerly materialized so
        the caller may delete the source dirs."""
        vs = [v for v in self.versions() if v > version]
        dirs = [os.path.join(self._vdir(v), "delta") for v in vs]
        out = self.spark.read.parquet(*dirs).filter(
            F.col("height") < below_height
        )
        return out.localCheckpoint(eager=True)

    def read(self, version: int | None = None) -> DataFrame | None:
        """Totals at `version` → (token_id, n_boxes, total_amount):
        newest base at-or-below plus the bounded delta chain, one
        token-dim hash aggregate. O(tokens) rows end to end."""
        v = self.current_version() if version is None else version
        vs = [x for x in self.versions() if x <= v]
        if not vs:
            return None
        bases = [x for x in vs if self._has_base(x)]
        b = max(bases) if bases else 0
        delta_dirs = [
            os.path.join(self._vdir(x), "delta") for x in vs if x > b
        ]
        base_df = (
            self.spark.read.parquet(os.path.join(self._vdir(b), "base"))
            if b
            else None
        )
        if not delta_dirs:
            return base_df
        deltas = self.spark.read.parquet(*delta_dirs).select(
            "token_id", "n_boxes", "total_amount"
        )
        both = (
            deltas
            if base_df is None
            else base_df.select(
                "token_id", "n_boxes", "total_amount"
            ).unionByName(deltas)
        )
        return both.groupBy("token_id").agg(
            F.sum("n_boxes").alias("n_boxes"),
            F.sum("total_amount").alias("total_amount"),
        )

    def top(self, k: int = 100, version: int | None = None) -> DataFrame:
        """The q15b endpoint from the maintained rollup — identical
        result contract to `stats.top_tokens_by_box_count(assets, k)`
        over the full assets table (stream==batch pinned). Served from
        the commit-time `topk` sidecar when it covers `k` (a ~k-row
        single-file scan, ≤0.1 s at the 1.9M anchor vs 0.44 s for the
        read+agg path); larger k falls back to the aggregate."""
        v = self.current_version() if version is None else version
        vs = [x for x in self.versions() if x <= v]
        if not vs:
            raise RuntimeError("empty rollup: no committed versions")
        side = os.path.join(self._vdir(vs[-1]), "topk")
        if k <= self.serve_top_k and os.path.exists(side):
            return (
                self.spark.read.parquet(side)
                .orderBy(F.asc("rank"))
                .limit(k)
                .drop("rank")
            )
        totals = self.read(v)
        return totals.orderBy(
            F.desc("n_boxes"), F.asc("token_id")
        ).limit(k)
