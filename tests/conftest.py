from __future__ import annotations

import pytest

from ergo_uexplorer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("uexplorer-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
