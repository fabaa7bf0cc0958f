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

from ..functions.crypto import decode_register, decode_utf8_register
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
      SELECT p_partkey, p_size, unnest([p_name, repeat(p_name, 14)]) AS s
      FROM part
    ),
    enc AS (SELECT p_partkey, p_size, s, strlen(s) AS n FROM names)
    SELECT p_partkey,
           CAST(n AS BIGINT) AS n_bytes,
           '0e' ||
           CASE WHEN n < 128 THEN lpad(lower(to_hex(n)), 2, '0')
                ELSE lpad(lower(to_hex(n % 128 + 128)), 2, '0')
                     || lpad(lower(to_hex(n // 128)), 2, '0') END
           || lower(hex(s)) AS raw,
           s AS decoded,
           CASE WHEN p_size IS NULL OR p_partkey IS NULL THEN NULL
                ELSE '(SInt, SInt)' END AS pair_type,
           '[' || p_size || ',' || (p_partkey % 60) || ']' AS pair_rendered,
           CASE WHEN p_size IS NULL OR p_partkey IS NULL THEN NULL
                ELSE '(SInt, SInt, SInt)' END AS tup_type,
           '[' || p_size || ',' || (p_partkey % 60) || ',7]' AS tup_rendered
    FROM enc
"""


def _zz1(v: Column) -> Column:
    """Zigzag VLQ hex for 0 <= v <= 63 (single byte)."""
    return _hx(v * 2)


@register(
    "zz_r01_register_decode",
    sql=_R01_SQL,
    survey_ref="T6 RegistersParser.scala:20-89 / TokenPropsParser.scala:14-19",
    tags=("registers", "crypto"),
)
def zz_r01_register_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EIP-4 Coll[Byte] strip via the JVM path PLUS the full sigma
    constant decoder over pair and general-tuple registers built from
    the row's own numbers (symmetric pair code 0x58, TupleTypeCode 0x60)
    — the oracle states the expected render directly, so a type- or
    zigzag-decode bug hash-fails."""
    (part,) = load(spark, sf_dir, "part")
    names = part.select(
        "p_partkey",
        "p_size",
        F.explode(
            F.array(F.col("p_name"), F.repeat(F.col("p_name"), 14))
        ).alias("s"),
    )
    n = F.octet_length(F.col("s"))
    raw = F.concat(F.lit("0e"), _vlq_col(n), F.lower(F.hex(F.col("s"))))
    a, b = F.col("p_size").cast("long"), (F.col("p_partkey") % 60).cast("long")
    pair_raw = F.concat(F.lit("58"), _zz1(a), _zz1(b))
    tup_raw = F.concat(F.lit("6003040404"), _zz1(a), _zz1(b), F.lit("0e"))
    pair = decode_register(pair_raw)
    tup = decode_register(tup_raw)
    return names.select(
        "p_partkey",
        n.cast("bigint").alias("n_bytes"),
        raw.alias("raw"),
        decode_utf8_register(raw).alias("decoded"),
        pair["sigma_type"].alias("pair_type"),
        pair["rendered"].alias("pair_rendered"),
        tup["sigma_type"].alias("tup_type"),
        tup["rendered"].alias("tup_rendered"),
    )
