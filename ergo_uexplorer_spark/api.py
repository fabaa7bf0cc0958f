"""The reference's REST/GraphQL query surface as one facade
(SURVEY §2.4 Q17 route list, backend/TapirRoutes.scala:24-120; Q20
GraphQL ≈ spark.sql over the same tables).

`endpoint(tables, route, ...)` resolves any of the 42+ box routes plus
blocks/stats/info — `{boxes,box-ids} × {unspent,spent,any} ×
{by-address, by-ergo-tree, by-ergo-tree-hash, by-ergo-tree-template,
by-ergo-tree-template-hash, by-token-id, by-id}` — to a lazily-planned
DataFrame. `register_views` exposes every lakehouse table to
`spark.sql(...)`, which is the Stargate-GraphQL equivalent (eq-filters
push down to the scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import boxes as B
from .operators.stats import (
    top_addresses_by_utxo_count,
    top_addresses_by_value,
    top_tokens_by_box_count,
)

_KEY_KINDS = {
    "by-address": "address",
    "by-ergo-tree": "ergo_tree",
    "by-ergo-tree-hash": "ergo_tree_hash",
    "by-ergo-tree-template": "template",
    "by-ergo-tree-template-hash": "template_hash",
    "by-token-id": "token_id",
    "by-id": "box_id",
}
_LIVENESS = ("unspent", "spent", "any")


def routes() -> list[str]:
    """Enumerate the full box route surface (mirrors TapirRoutes)."""
    out = []
    for shape in ("boxes", "box-ids"):
        for liveness in _LIVENESS:
            for key in _KEY_KINDS:
                out.append(f"{shape}/{liveness}/{key}")
    out += [
        "blocks/latest",
        "blocks/by-id",
        "info",
        "stats/top-addresses/by-box-count",
        "stats/top-addresses/by-value",
        "stats/top-tokens/by-box-count",
    ]
    return out


def endpoint(
    tables: dict[str, DataFrame],
    route: str,
    keys: list[str] | None = None,
    params: dict[str, str] | None = None,
    limit: int = 500,
) -> DataFrame:
    """Resolve a route string to its DataFrame (the Tapir route handlers,
    collapsed; BoxService.scala:59-365)."""
    parts = route.strip("/").split("/")
    if parts[0] in ("boxes", "box-ids"):
        shape, liveness, key = parts
        kind = _KEY_KINDS[key]
        if shape == "boxes":
            return B.select_boxes(tables, liveness, kind, keys, params)
        return B.box_ids(tables, liveness, kind, keys, params)
    if route == "blocks/latest":
        return B.last_blocks(tables, limit)
    if route == "blocks/by-id":
        return B.blocks_by_ids(tables, keys or [])
    if route == "info":
        return B.chain_info(tables)
    if route == "stats/top-addresses/by-box-count":
        return top_addresses_by_utxo_count(tables["address_stats"], k=limit)
    if route == "stats/top-addresses/by-value":
        return top_addresses_by_value(tables["address_stats"], k=limit)
    if route == "stats/top-tokens/by-box-count":
        return top_tokens_by_box_count(tables["assets"], k=limit)
    raise ValueError(f"unknown route: {route}")


VIEW_TABLES = (
    "headers",
    "transactions",
    "outputs",
    "inputs",
    "data_inputs",
    "assets",
    "tokens",
    "ergo_trees",
    "boxes",
    "blocks",
    "utxo",
    "address_stats",
)


def register_views(
    spark: SparkSession, tables: dict[str, DataFrame], prefix: str = ""
) -> list[str]:
    """Q20: expose the lakehouse to SQL — `spark.sql("SELECT * FROM utxo
    WHERE ergo_tree_hash = ...")` is the engine's GraphQL."""
    registered = []
    for name in VIEW_TABLES:
        if name in tables:
            view = f"{prefix}{name}"
            tables[name].createOrReplaceTempView(view)
            registered.append(view)
    return registered
