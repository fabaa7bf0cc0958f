"""Ad-hoc per-entry timing with bench.py's exact methodology (noop
write, best-of-2, tuned session): `python tools/microbench.py name1
name2 ...` — for iterating on one operator family without paying the
full 175-entry suite."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ergo_uexplorer_spark.session import get_spark  # noqa: E402
from ergo_uexplorer_spark.suite import REGISTRY  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("uexplorer-microbench")
    import bench

    timings = {}
    for _ in range(2):
        for name in names:
            fn = bench._RAW_FN.get(name) or REGISTRY[name].fn
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
