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

    `events.ts` is normalized to BIGINT nanos-since-epoch regardless of
    how the engine surfaces it: the parquet annotation is
    TIMESTAMP(MICROS, isAdjustedToUTC=false), which PySpark 4.x reads as
    `timestamp_ntz` (older environments delivered a long). All suite
    queries treat `ts` as nanos, so when the column arrives as a
    timestamp type we rebuild it as `unix_micros(ts) * 1000` — loss-free
    (µs-precision source) and engine/timezone-proof. The DuckDB oracle
    side uses `epoch_ns(ts)`, which needs no change.
    """
    out = []
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        df = normalize_ts(df)
        out.append(df)
    return out


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """If `col` is a timestamp/timestamp_ntz, replace it with BIGINT
    nanos-since-epoch (`unix_micros × 1000`, loss-free for µs data).
    No-op when the column is absent or already a long.

    timestamp_ntz carries a wall-clock value the oracle (DuckDB
    ``epoch_ns``) interprets as UTC, while ``cast('timestamp')``
    interprets it in the SESSION timezone — so when the session isn't
    UTC we first shift the wall clock with ``convert_timezone`` to keep
    the epoch value session-tz-independent.
    """
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    if dtypes.get(col) not in ("timestamp", "timestamp_ntz"):
        return df

    tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    src = F.col(col)
    if dtypes[col] == "timestamp_ntz" and tz not in ("UTC", "Etc/UTC", "GMT"):
        # wall clock is UTC; re-express it in the session tz so the
        # subsequent session-tz cast lands on the same instant
        src = F.convert_timezone(F.lit("UTC"), F.lit(tz), src)
    ns = (F.unix_micros(src.cast("timestamp")) * F.lit(1000)).alias(col)
    return df.select(*[ns if c == col else F.col(c) for c in df.columns])


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


def emb_valid_sql(dim: int, col: str = "embedding") -> str:
    """Oracle-side mirror of `operators.similarity.valid_embeddings`:
    the null/ragged/null-element screen every public similarity
    operator applies at entry. A no-op on clean data; on dirty corpora
    the oracle must drop the same rows the engine drops (the dirty-twin
    sweep gate). Null ELEMENTS are screened here at the base level
    because the engines structurally disagree on them: Spark's
    zip_with fold propagates the null while DuckDB's list functions
    skip it and produce a finite score (the -7 dirty row's finding)."""
    return (
        f"{col} IS NOT NULL AND len({col}) = {dim}"
        f" AND len(list_filter({col}, x -> x IS NULL)) = 0"
    )


def emb_finite_sql(dim: int, col: str = "embedding") -> str:
    """Oracle-side mirror of the stricter screen the STATISTICS family
    (gram / quantization / k-means / cell-balance) applies — those
    operators also exclude non-finite vectors, because one NaN poisons
    an integer-exact accumulator (the ANN scoring family instead lets
    NaN flow: both engines rank NaN as largest, and they agree)."""
    # `x IS NULL` must be tested EXPLICITLY: isnan(NULL)/isfinite(NULL)
    # are NULL in DuckDB, so a NULL element would be excluded from the
    # filter and the vector would PASS — while the engine screen
    # (valid_embeddings(finite=True)) drops any vector containing a
    # NULL element. One null element in an otherwise correct-length
    # vector would desynchronize the two (r10 ADVICE finding).
    return (
        f"{emb_valid_sql(dim, col)} AND len(list_filter({col},"
        f" x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0"
    )
