"""In-repo table-based DataSource standing in for the Cassandra
connector (S9 — cassandra/entity/CassandraOutputsWriter.scala:16-49 and
its six siblings in the reference, one CQL INSERT binding per table).

The real spark-cassandra-connector jar is not bundled in this
environment, so the S9 integration contract — `storage.write_table_sink`
routing a gold table through ``.write.format(<connector>)
.options(keyspace=..., table=...)`` — is exercised end-to-end against
this PySpark Python Data Source (Spark 4 `pyspark.sql.datasource` API)
instead: a *table-based* sink that validates the connector-style options
(`keyspace`/`table` must be present, exactly like the connector's
assertions) and lands each "table" as JSONL under
``$UEX_MOCK_CASSANDRA_DIR/<keyspace>/<table>/``, executor-side and
distributed (one file per task commit, like a real connector's
per-partition session).

Swapping in the real connector is the one-line `SinkConfig` format
change (`storage.cassandra_sink`); everything this mock validates —
option plumbing, append mode, per-table routing, task-level commit
messages — is the part our code owns.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MOCK_CASSANDRA_FORMAT = "mock_cassandra"
_DIR_ENV = "UEX_MOCK_CASSANDRA_DIR"


@dataclass
class _Committed(WriterCommitMessage):
    file: str
    rows: int


class _MockCassandraWriter(DataSourceWriter):
    """Executor-side writer: one output file per task, commit messages
    aggregated on the driver (the V2 commit protocol the real connector
    also rides)."""

    def __init__(self, options, schema):
        # the connector's own contract: these options are mandatory
        for key in ("keyspace", "table"):
            if key not in options:
                raise ValueError(
                    f"mock_cassandra: missing required option '{key}' "
                    "(same contract as the Cassandra connector)"
                )
        root = options.get("dir") or os.environ.get(_DIR_ENV)
        if not root:
            raise ValueError(
                f"mock_cassandra: set option 'dir' or ${_DIR_ENV}"
            )
        self.out_dir = os.path.join(
            root, options["keyspace"], options["table"]
        )
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator):
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as f:
            for row in iterator:
                rec = {k: row[i] for i, k in enumerate(self.fields)}
                f.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return _Committed(file=path, rows=n)

    def commit(self, messages):
        total = sum(m.rows for m in messages if m is not None)
        marker = os.path.join(self.out_dir, "_SUCCESS")
        os.makedirs(self.out_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write(str(total))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class MockCassandraDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return MOCK_CASSANDRA_FORMAT

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _MockCassandraWriter(self.options, schema)


def register_mock_cassandra(spark) -> str:
    """Register the mock connector on the session; returns the format
    name to put in a `SinkConfig`."""
    spark.dataSource.register(MockCassandraDataSource)
    return MOCK_CASSANDRA_FORMAT
