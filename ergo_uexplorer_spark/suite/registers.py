"""Oracle-checked register decoding (T6/T8 subset): sigma-serialized
Coll[Byte] registers are CONSTRUCTED deterministically from `part`
names (0e + unsigned-VLQ length + utf-8 payload — the 14x-repeated
variant exceeds 127 bytes, exercising the 2-byte VLQ), then stripped by the engine's real JVM decode path
(`decode_utf8_register`). The oracle builds the identical wire bytes in
SQL and asserts the round trip, so a prefix/VLQ/length-validation bug
hash-fails instead of hiding behind fixtures."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.crypto import decode_utf8_register
from .base import load, register


def _hx(c: Column) -> Column:
    return F.lpad(F.lower(F.conv(c.cast("string"), 10, 16)), 2, "0")


def _vlq_col(n: Column) -> Column:
    """Unsigned VLQ hex for n < 16384 (1 or 2 bytes)."""
    return F.when(n < 128, _hx(n)).otherwise(
        F.concat(_hx(n % 128 + 128), _hx(F.floor(n / 128).cast("long")))
    )


_R01_SQL = """
    WITH names AS (
      SELECT p_partkey, unnest([p_name, repeat(p_name, 14)]) AS s FROM part
    ),
    enc AS (SELECT p_partkey, s, strlen(s) AS n FROM names)
    SELECT p_partkey,
           CAST(n AS BIGINT) AS n_bytes,
           '0e' ||
           CASE WHEN n < 128 THEN lpad(lower(to_hex(n)), 2, '0')
                ELSE lpad(lower(to_hex(n % 128 + 128)), 2, '0')
                     || lpad(lower(to_hex(n // 128)), 2, '0') END
           || lower(hex(s)) AS raw,
           s AS decoded
    FROM enc
"""


@register(
    "r01_register_decode",
    sql=_R01_SQL,
    survey_ref="T6 RegistersParser.scala:20-89 / TokenPropsParser.scala:14-19",
    tags=("registers", "crypto"),
)
def r01_register_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = load(spark, sf_dir, "part")
    names = part.select(
        "p_partkey",
        F.explode(
            F.array(F.col("p_name"), F.repeat(F.col("p_name"), 14))
        ).alias("s"),
    )
    n = F.octet_length(F.col("s"))
    raw = F.concat(F.lit("0e"), _vlq_col(n), F.lower(F.hex(F.col("s"))))
    return names.select(
        "p_partkey",
        n.cast("bigint").alias("n_bytes"),
        raw.alias("raw"),
        decode_utf8_register(raw).alias("decoded"),
    )
