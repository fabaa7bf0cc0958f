"""uexplorer-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of pragmaxim-com/ergo-uexplorer.

Layout:
  session        - tuned SparkSession factory (AQE, skew-join, arrow)
  sources        - block/mempool sources (SURVEY S1-S5)
  operators      - normalization, chain/fork, UTXO, cumulative stats, query
                   surface, stats, graph, dedup, similarity, text ops
  streaming      - incremental sync / mempool diff (C10-C11)
  suite          - the generic operator surface bound to the driver's
                   TPC-H-ish testdata, each with a DuckDB oracle
  fixtures       - deterministic synthetic chain generator (FIXTURES.md)
"""

__version__ = "0.1.0"
