"""Suite plumbing: QueryDef registry + table loader.

Each suite entry binds ONE operator from SURVEY.md §2 (or an LLM-data
pipeline operator) to the driver testdata tables, together with the
ANSI-SQL DuckDB oracle that must hash-match it. Column names are aliased
identically on both sides (driver compares sorted-by-name columns).

Determinism rules used throughout the suite:
  * money/double aggregations go through DECIMAL(38,6) casts on BOTH
    sides so sum order can't produce FP drift between engines;
  * every LIMIT has a total order (unique tiebreak column);
  * set-returning queries never depend on row order (driver hash is
    order-insensitive).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load parquet tables. Plain `spark.read.parquet` so Catalyst keeps
    full pushdown/pruning freedom (scans show PushedFilters/ReadSchema).

    events.parquet carries TIMESTAMP(NANOS) which Spark only reads as a
    long (nanos since epoch) under the legacy flag — set it defensively
    here since the driver owns the session. Queries treat `ts` as nanos.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    survey_ref: str = ""  # e.g. "Q8 BoxService.scala:132-138"
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    sql: str | None,
    survey_ref: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    def deco(fn):
        REGISTRY[name] = QueryDef(
            name=name, fn=fn, sql=sql, survey_ref=survey_ref, tags=tags, bench=bench
        )
        return fn

    return deco
