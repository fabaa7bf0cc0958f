"""Crypto/parsing functions (SURVEY §2.2 T6-T9).

Hashing stays JVM-side (`sha2(unhex(...))` — exact equivalent of the
reference's Sha256 over tree bytes, ErgoTreeParser.scala:105-108). Only
base58check and the tree/template/register parsing are Python — they run
as Arrow-batched pandas UDFs, and only over the (small, deduplicated)
`ergo_trees` dimension, never the box fact table.

Scope matches SURVEY §7's "crypto fidelity" decision: sha256 exact;
template extraction for the fixture/common tree forms; base58check with
blake2b256 checksum like Ergo's address encoding; exotic/malformed trees
degrade to the fallback-address path exactly like
ErgoTreeParser.scala:87-90.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

P2PK_PREFIX = 0x01
P2SH_PREFIX = 0x02
P2S_PREFIX = 0x03


def _b58encode(data: bytes) -> str:
    num = int.from_bytes(data, "big")
    out = []
    while num:
        num, rem = divmod(num, 58)
        out.append(_B58_ALPHABET[rem])
    n_leading_zeros = len(data) - len(data.lstrip(b"\x00"))
    out.extend(_B58_ALPHABET[0] * n_leading_zeros)
    return "".join(reversed(out)) or _B58_ALPHABET[0]


def _b58decode(s: str) -> bytes | None:
    try:
        num = 0
        for ch in s:
            num = num * 58 + _B58_ALPHABET.index(ch)
        raw = num.to_bytes((num.bit_length() + 7) // 8, "big")
        pad = len(s) - len(s.lstrip(_B58_ALPHABET[0]))
        return b"\x00" * pad + raw
    except ValueError:
        return None


def _address_from_content(prefix: int, content: bytes) -> str:
    """base58(prefix ++ content ++ blake2b256-checksum[:4]) — Ergo's
    address encoding shape (ErgoAddressEncoder semantics)."""
    body = bytes([prefix]) + content
    checksum = hashlib.blake2b(body, digest_size=32).digest()[:4]
    return _b58encode(body + checksum)


def _tree_to_address(tree_hex: str) -> str:
    """ErgoTree hex → address. P2PK trees (0008cd + 33-byte point) encode
    the point; other valid trees encode the whole script as P2S; invalid
    hex falls back to a sentinel P2S of the utf-8 bytes (the reference's
    fallback-address path)."""
    try:
        raw = bytes.fromhex(tree_hex)
        if tree_hex.startswith("0008cd") and len(tree_hex) == 6 + 66:
            return _address_from_content(P2PK_PREFIX, raw[3:])
        return _address_from_content(P2S_PREFIX, raw)
    except ValueError:
        return _address_from_content(P2S_PREFIX, tree_hex.encode())


def _tree_t8(tree_hex: str) -> str | None:
    """Template (T8) extraction. P2PK trees have no stored template (the
    reference stores T8 only for 'contract' trees); the synthetic contract
    form is header '19' + 1-byte n_consts + 4-byte constants + body, the
    template being the body. Unknown/malformed → None (fallback)."""
    if not tree_hex or tree_hex.startswith("0008cd"):
        return None
    if tree_hex.startswith("19") and len(tree_hex) >= 4:
        try:
            n_consts = int(tree_hex[2:4], 16)
            body_start = 4 + n_consts * 8
            body = tree_hex[body_start:]
            return body or None
        except ValueError:
            return None
    return None


def _fallback_hash(tree_hex: str) -> str:
    """sha256 of the hex bytes when valid, else of the utf-8 bytes
    (malformed-tree fallback)."""
    try:
        raw = bytes.fromhex(tree_hex)
    except ValueError:
        raw = tree_hex.encode()
    return hashlib.sha256(raw).hexdigest()


@pandas_udf(StringType())
def ergo_tree_to_address(tree_hex: pd.Series) -> pd.Series:
    return tree_hex.map(lambda t: _tree_to_address(t) if t else None)


@pandas_udf(StringType())
def ergo_tree_t8(tree_hex: pd.Series) -> pd.Series:
    return tree_hex.map(lambda t: _tree_t8(t) if t else None)


@pandas_udf(StringType())
def ergo_tree_hash_py(tree_hex: pd.Series) -> pd.Series:
    return tree_hex.map(lambda t: _fallback_hash(t) if t else None)


@pandas_udf(StringType())
def address_type(addr: pd.Series) -> pd.Series:
    """Base58-decode head byte → P2PK/P2SH/P2S (Const.scala:123-132)."""

    def _t(a: str | None) -> str | None:
        if not a:
            return None
        raw = _b58decode(a)
        if not raw:
            return None
        return {P2PK_PREFIX: "P2PK", P2SH_PREFIX: "P2SH", P2S_PREFIX: "P2S"}.get(
            raw[0], "UNKNOWN"
        )

    return addr.map(_t)


def ergo_tree_hash(tree_hex_col: Column) -> Column:
    """sha256 of the tree bytes — JVM built-in for valid hex
    (`sha2(unhex(x))`), Python fallback hash for malformed trees (the
    rare path, matching ErgoTreeParser's fallback)."""
    valid = tree_hex_col.rlike("^([0-9a-fA-F]{2})+$")
    return F.when(
        valid, F.lower(F.sha2(F.unhex(tree_hex_col), 256))
    ).otherwise(ergo_tree_hash_py(tree_hex_col))


def ergo_tree_t8_hash(t8_hex_col: Column) -> Column:
    return F.when(
        t8_hex_col.isNotNull(), F.lower(F.sha2(F.unhex(t8_hex_col), 256))
    )


# ---------------------------------------------------------------------------
# register decoding (T6/T8 subset: Coll[Byte], SInt-ish, EIP-4 props)
# ---------------------------------------------------------------------------


def _decode_register(hex_val: str | None) -> tuple[str, str] | None:
    """hex → (sigmaType, renderedValue); None when undecodable
    (RegistersParser.scala:80-88 ExpandedRegister(raw, None))."""
    if not hex_val:
        return None
    try:
        if hex_val.startswith("0e"):  # Coll[Byte]: 0e + len + bytes
            return ("Coll[SByte]", hex_val[4:])
        if hex_val.startswith("04") and len(hex_val) <= 6:  # small SInt
            return ("SInt", str(int(hex_val[2:] or "0", 16)))
        bytes.fromhex(hex_val)
        return ("Coll[SByte]", hex_val)
    except ValueError:
        return None


@pandas_udf(
    StructType(
        [StructField("sigma_type", StringType()), StructField("rendered", StringType())]
    )
)
def decode_register(hex_val: pd.Series) -> pd.DataFrame:
    decoded = hex_val.map(_decode_register)
    return pd.DataFrame(
        {
            "sigma_type": decoded.map(lambda d: d[0] if d else None),
            "rendered": decoded.map(lambda d: d[1] if d else None),
        }
    )


def decode_utf8_register(hex_col: Column) -> Column:
    """EIP-4 token props: R4/R5 are utf-8 payloads (TokenPropsParser.scala:
    14-19). JVM-side, null-on-undecodable (the reference's props parser
    returns None for malformed registers rather than failing ingest)."""
    raw = F.unhex(hex_col)
    return F.when(F.is_valid_utf8(raw), F.decode(raw, "UTF-8"))


# Ship this module's UDFs by VALUE: Spark python workers don't share the
# driver's sys.path, so by-reference pickling breaks whenever the driver
# isn't launched from the repo root (no --py-files needed this way).
try:  # pragma: no cover
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; --py-files is the fallback
    pass
