"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the suite registry in
``ergo_uexplorer_spark.suite`` — every registered operator carries its
Spark implementation and its DuckDB oracle side by side (same module,
shared constants), one entry per operator class from SURVEY.md §2 plus
the LLM-data-pipeline operators (dedup / similarity / text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ergo_uexplorer_spark.suite import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the box-query backbone
    shape (selective broadcast join chain + agg + top-k)."""
    return REGISTRY["zz_q06_left_join_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.sql for name, qd in sorted(REGISTRY.items()) if qd.sql is not None
    }
