"""End-to-end chain ingest invariants (FIXTURES.md §4, mirroring the
reference's StreamSchedulerSpec/BoxRoutesSpec assertions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ergo_uexplorer_spark.fixtures.chaingen import (
    EXCHANGE_PK,
    ChainGen,
    p2pk_tree,
    write_jsonl_gz,
)
from ergo_uexplorer_spark.functions.crypto import _tree_to_address
from ergo_uexplorer_spark.operators.chain import (
    assert_chained,
    detect_forks,
    missing_heights,
)
from ergo_uexplorer_spark.operators.utxo import (
    spent_boxes,
    verify_spend_integrity,
)
from ergo_uexplorer_spark.pipeline import ingest_blocks

N_BLOCKS = 250
FORK_AT = N_BLOCKS - 1  # shorter fork: diverges for last 2 heights


@pytest.fixture(scope="module")
def chain_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chain")
    gen = ChainGen(seed=42)
    gen.generate(N_BLOCKS)
    write_jsonl_gz(gen.blocks, str(d / "blocks_main.jsonl.gz"))
    shorter = gen.fork(FORK_AT, 0, "fshort")
    write_jsonl_gz(shorter, str(d / "blocks_shorter.jsonl.gz"))
    longer = gen.fork(FORK_AT - 2, 1, "flong")
    write_jsonl_gz(longer, str(d / "blocks_longer.jsonl.gz"))
    return d


@pytest.fixture(scope="module")
def tables(spark, chain_dir):
    return ingest_blocks(spark, str(chain_dir / "blocks_main.jsonl.gz"))


def test_chain_complete(tables):
    hm = tables["headers_main"]
    assert hm.count() == N_BLOCKS
    assert hm.agg(F.max("height")).collect()[0][0] == N_BLOCKS
    assert missing_heights(hm).count() == 0
    assert_chained(hm)


def test_spend_integrity(tables):
    verify_spend_integrity(tables["boxes_main"], tables["inputs_main"])


def test_utxo_partition(tables):
    """unspent ∩ spent = ∅ and |spent| + |unspent| = |any|
    (BoxRoutesSpec.scala:89-98)."""
    boxes = tables["boxes_main"]
    spent = spent_boxes(boxes, tables["inputs_main"])
    unspent = tables["utxo"]
    assert spent.count() + unspent.count() == boxes.count()
    assert (
        unspent.select("box_id").intersect(spent.select("box_id")).count() == 0
    )


def test_block_cumulative_stats(tables):
    """Recompute every running total in pandas and compare exactly
    (BlockBuilder.scala:27-63 semantics)."""
    pdf = (
        tables["blocks"]
        .orderBy("height")
        .toPandas()
        .set_index("height", drop=False)
    )
    per_tx = (
        tables["transactions_main"]
        .groupBy("height")
        .agg(F.count(F.lit(1)).alias("n_txs"))
        .toPandas()
        .set_index("height")
        .sort_index()
    )
    per_out = (
        tables["boxes_main"]
        .groupBy("height")
        .agg(F.count(F.lit(1)).alias("n_outs"))
        .toPandas()
        .set_index("height")
        .sort_index()
    )
    assert (pdf["txs_count"] == per_tx["n_txs"]).all()
    assert (pdf["max_tx_gix"] == per_tx["n_txs"].cumsum() - 1).all()
    assert (pdf["max_box_gix"] == per_out["n_outs"].cumsum() - 1).all()
    assert (pdf["total_txs_count"] == per_tx["n_txs"].cumsum()).all()
    assert (
        pdf["block_chain_total_size"] == pdf["block_size"].cumsum()
    ).all()
    assert (pdf["total_fees"] == pdf["block_fee"].cumsum()).all()
    assert (pdf["total_coins_in_txs"] == pdf["block_coins"].cumsum()).all()
    # mining time: col is ts−parent.ts (0 for first); the running total's
    # first increment is the raw first timestamp (reference quirk)
    ts = pdf["timestamp"]
    expected_bmt = ts.diff().fillna(0).astype("int64")
    assert (pdf["block_mining_time"] == expected_bmt).all()
    expected_tmt = ts.diff().fillna(ts.iloc[0]).astype("int64").cumsum()
    assert (pdf["total_mining_time"] == expected_tmt).all()
    # fees present on some blocks (fixture invariant 3)
    assert (pdf["block_fee"] > 0).any()
    assert (pdf["miner_reward"] == 75 * 10**9).all()


def test_top_addresses_planted_skew(tables):
    """The exchange supernode address must lead both top-K stats
    (StatsService.scala:12-35 / planted skew, FIXTURES §1.5)."""
    exchange_addr = _tree_to_address(p2pk_tree(EXCHANGE_PK))
    stats = tables["address_stats"]
    by_count = stats.orderBy(F.desc("utxo_count")).first()
    assert by_count["address"] == exchange_addr
    assert by_count["utxo_count"] > 100


def test_tokens_eip4(tables):
    toks = tables["tokens"].toPandas()
    assert len(toks) > 0
    assert toks["name"].str.startswith("TOK").all()
    assert toks["decimals"].between(0, 8).all()
    # mint rule: token_id is the first input of its tx — unique per tx
    assert toks["token_id"].is_unique


def test_tree_dimension(tables):
    trees = tables["ergo_trees"].toPandas()
    # malformed trees degrade to fallback (no t8, still addressable)
    bad = trees[trees["ergo_tree"].str.startswith("zz-")]
    assert len(bad) > 0
    assert bad["ergo_tree_t8"].isna().all()
    assert bad["address"].notna().all()
    p2pk = trees[trees["ergo_tree"].str.startswith("0008cd")]
    assert (p2pk["address_type"] == "P2PK").all()
    assert p2pk["ergo_tree_t8"].isna().all()
    contract = trees[trees["ergo_tree"].str.startswith("19")]
    assert len(contract) > 0
    assert contract["ergo_tree_t8"].notna().all()
    assert contract["ergo_tree_t8_hash"].notna().all()


def test_malformed_lines_dropped(spark, tmp_path):
    """Permissive-mode null rows from garbage lines must not reach the
    chain operators (they'd poison height arithmetic)."""
    import gzip
    import json as _json

    gen = ChainGen(seed=2)
    gen.generate(5)
    p = tmp_path / "dirty.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for b in gen.blocks:
            f.write(_json.dumps(b) + "\n")
        f.write('{"not": "a block"}\n')
        f.write("complete garbage\n")
    from ergo_uexplorer_spark.sources.blocks import read_blocks

    assert read_blocks(spark, str(p)).count() == 5
    assert read_blocks(spark, str(p), validate=False).count() == 7
    tables = ingest_blocks(spark, str(p))
    assert tables["headers_main"].count() == 5


def test_resolve_main_chain_bounded_collect(spark):
    """An early historical fork on a long chain must collect O(fork)
    rows to the driver — NOT every header above the fork (the round-2
    scale finding: `lo` = lowest contested height ever meant the whole
    chain came back on every run)."""
    from ergo_uexplorer_spark.constants import GENESIS_ID
    from ergo_uexplorer_spark.operators.chain import (
        _fork_regions,
        resolve_main_chain,
    )

    n = 2000
    rows = [
        (f"b{h:05d}", f"b{h - 1:05d}" if h > 1 else GENESIS_ID, h)
        for h in range(1, n + 1)
    ]
    # losing 2-block fork at heights 5-6, plus a second fork at 100
    rows += [("f00005", "b00004", 5), ("f00006", "f00005", 6)]
    rows += [("g00100", "b00099", 100)]
    headers = spark.createDataFrame(
        rows, "block_id string, parent_id string, height int"
    )
    segments, collected = _fork_regions(headers)
    assert segments == [(5, 6), (100, 100)]
    # 4 + 2 contested rows + one anchor row per segment
    assert len(collected) <= 8
    mc = {
        r["block_id"]: r["main_chain"]
        for r in resolve_main_chain(headers).collect()
    }
    assert mc["b00005"] and mc["b00006"] and mc["b00100"]
    assert not mc["f00005"] and not mc["f00006"] and not mc["g00100"]
    assert all(mc[f"b{h:05d}"] for h in (1, 4, 7, 99, 101, n))


def test_fork_resolution_equivalence(spark, chain_dir):
    """Ingesting main ∪ shorter-fork ∪ longer-fork must produce exactly
    the state of ingesting the longer fork alone (rollback semantics,
    BlockWriter.scala:35-77 / StreamSchedulerSpec.scala:78-83)."""
    all_paths = [
        str(chain_dir / "blocks_main.jsonl.gz"),
        str(chain_dir / "blocks_shorter.jsonl.gz"),
        str(chain_dir / "blocks_longer.jsonl.gz"),
    ]
    from ergo_uexplorer_spark.sources.blocks import read_blocks
    from ergo_uexplorer_spark.pipeline import ingest_raw

    union = (
        read_blocks(spark, all_paths)
        .withColumn("__bid", F.col("header.id"))
        .dropDuplicates(["__bid"])
        .drop("__bid")
    )
    merged = ingest_raw(union)
    alone = ingest_blocks(spark, all_paths[2])

    merged_ids = {
        r["block_id"] for r in merged["headers_main"].select("block_id").collect()
    }
    alone_ids = {
        r["block_id"] for r in alone["headers_main"].select("block_id").collect()
    }
    assert merged_ids == alone_ids

    merged_utxo = {
        r["box_id"] for r in merged["utxo"].select("box_id").collect()
    }
    alone_utxo = {r["box_id"] for r in alone["utxo"].select("box_id").collect()}
    assert merged_utxo == alone_utxo

    # the losing branches' blocks are present but flagged off-main
    forks = detect_forks(merged["headers"])
    assert forks.count() >= 2
