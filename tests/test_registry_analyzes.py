"""Every registry entry must at least ANALYZE — cheap guard against
shipping an entry that fails resolution (the r5 z34 regression: a
column was projected away before a window expression referenced it,
an AnalysisException no test caught because the full parity sweep
wasn't re-run before the snapshot commit).

Accessing `.schema` forces Catalyst analysis (resolution + type
checking) without executing the plan, so the whole registry is checked
in seconds at sf0.001. Execution-level correctness stays with
tests/test_oracle_parity.py and tools/strict_parity.py.
"""

from __future__ import annotations

import pytest

from ergo_uexplorer_spark.suite import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_entry_analyzes(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert len(df.schema.fields) > 0
