"""Delta-Lake backend for the versioned UTXO state (S10 — the storage
the parquet `UtxoState` docstring promises to "collapse to" when the
`delta` package is present).

Same contract as `streaming.incremental.UtxoState`:

  * ``commit(created, spent, batch_id)`` — ONE atomic Delta commit that
    inserts the batch's outputs and deletes its spent boxes: a single
    ``MERGE INTO`` whose source is the tagged union of both sides, so
    write volume is O(batch) and there is never a half-applied version;
  * ``read(version)`` — time travel (``versionAsOf``);
  * ``rollback_to(version)`` — ``RESTORE TABLE ... VERSION AS OF``;
  * exactly-once under foreachBatch redelivery — the streaming batch id
    rides the commit's ``userMetadata``; a replayed batch finds it in
    the table history and returns the already-published version.

The module degrades gracefully: `delta_available()` is False when the
package (or the session's Delta catalog extension) is missing, and the
factory `utxo_state_for` falls back to the parquet implementation.
Tests parameterize over both backends and skip Delta when absent.

Reference analog: MvStorage.scala commit/rollbackTo (version-keyed
MVStore transactions); Delta's transaction log replaces the version
directories wholesale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental import UtxoState

_USER_METADATA_CONF = "spark.databricks.delta.commitInfo.userMetadata"


def delta_available(spark: SparkSession | None = None) -> bool:
    """True when delta-spark is importable (and, if a session is given,
    its catalog actually resolves the `delta` data source)."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    if spark is None:
        return True
    try:
        spark.read.format("delta")
        return True
    except Exception:  # noqa: BLE001 — extension not on the session
        return False


def utxo_state_for(
    spark: SparkSession, state_dir: str, backend: str = "auto", **kw
):
    """Backend selection for the versioned UTXO state: 'parquet',
    'delta', or 'auto' (delta when available, else parquet)."""
    if backend == "delta" or (backend == "auto" and delta_available(spark)):
        return DeltaUtxoState(spark, state_dir)
    return UtxoState(spark, state_dir, **kw)


class DeltaUtxoState:
    """`UtxoState` on a Delta table. Every `commit` is one MERGE INTO
    (one table version); history carries the streaming batch id for
    exactly-once redelivery; RESTORE implements fork rollback."""

    def __init__(self, spark: SparkSession, state_dir: str):
        import os

        self.spark = spark
        self.path = os.path.join(state_dir, "utxo_delta")

    # -- helpers ----------------------------------------------------------
    def _table(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    def _exists(self) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.path)

    def _live_history(self) -> list[dict]:
        """History rows that are still on the state lineage: a RESTORE
        to version ``v`` kills every commit with ``v < version < restore
        commit``. Without this, a redelivered batch id whose commit was
        rolled back would be found in history and wrongly skipped
        (exactly-once must re-apply it against the restored state)."""
        if not self._exists():
            return []
        rows = (
            self._table()
            .history()
            .select(
                "version", "operation", "operationParameters", "userMetadata"
            )
            .orderBy("version")
            .collect()
        )
        live: list[dict] = []
        for r in rows:
            d = r.asDict()
            if (d.get("operation") or "").upper() == "RESTORE":
                params = d.get("operationParameters") or {}
                target = params.get("version")
                if target is not None:
                    t = int(target)
                    live = [x for x in live if x["version"] <= t]
            live.append(d)
        return live

    def versions(self) -> list[int]:
        return [r["version"] for r in self._live_history()]

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    # -- contract ---------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame | None:
        if not self._exists():
            return None
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(self.path)

    def batch_version(self, batch_id: int) -> int | None:
        hits = [
            r["version"]
            for r in self._live_history()
            if r.get("userMetadata") == str(batch_id)
        ]
        return max(hits) if hits else None

    def commit(
        self,
        created: DataFrame,
        spent: DataFrame,
        batch_id: int | None = None,
    ) -> int:
        if batch_id is not None:
            existing = self.batch_version(batch_id)
            if existing is not None:
                return existing
        meta_prev = self.spark.conf.get(_USER_METADATA_CONF, None)
        if batch_id is not None:
            self.spark.conf.set(_USER_METADATA_CONF, str(batch_id))
        try:
            if not self._exists():
                # initial version: the batch's own net state
                created.join(
                    spent.select("box_id"), "box_id", "left_anti"
                ).write.format("delta").save(self.path)
                return self.current_version()
            # ONE atomic merge: source = created ∪ spent, tagged; matched
            # spent rows delete, unmatched created rows insert. Both sides
            # of the batch land in a single table version. The created
            # side is pre-netted against same-batch spends — a box both
            # created and spent inside the batch must NOT survive (the
            # 's' row only deletes rows already IN the table, so without
            # the net the unmatched 'c' row would be inserted), matching
            # the parquet backend's read-side anti-join semantics.
            created_net = created.join(
                spent.select("box_id"), "box_id", "left_anti"
            )
            src = created_net.withColumn("__op", F.lit("c")).unionByName(
                spent.select("box_id").withColumn("__op", F.lit("s")),
                allowMissingColumns=True,
            )
            insert_cols = {c: f"s.{c}" for c in created.columns}
            (
                self._table()
                .alias("t")
                .merge(src.alias("s"), "t.box_id = s.box_id")
                .whenMatchedDelete(condition="s.__op = 's'")
                .whenNotMatchedInsert(
                    condition="s.__op = 'c'", values=insert_cols
                )
                .execute()
            )
            return self.current_version()
        finally:
            if batch_id is not None:
                if meta_prev is None:
                    self.spark.conf.unset(_USER_METADATA_CONF)
                else:
                    self.spark.conf.set(_USER_METADATA_CONF, meta_prev)

    def rollback_to(self, version: int) -> None:
        self._table().restoreToVersion(version)
