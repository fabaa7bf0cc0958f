"""Protocol constants (Const.scala:17-113 equivalents for the synthetic
chain model). The designated trees play the roles of Ergo's fee/emission
contracts; genesis pseudo-boxes are excluded from UTXO existence checks
like Emission/Foundation input boxes (backend/PersistentRepo.scala:28-31).
"""

GENESIS_ID = "0" * 64
GENESIS_EMISSION_BOX = "e" * 64
GENESIS_BOXES = frozenset({GENESIS_EMISSION_BOX, "f" * 64})

FEE_TREE = "1005040004000e36100204a7b1"
EMISSION_TREE = "101004020e368cc7a7017300"
EXCHANGE_PK = "03" + "ab" * 32

NANO = 1_000_000_000
EPOCH_LENGTH = 1024  # Const.scala:98
