"""Per-entry profiler for the optimization rounds: for each named
registry entry (default: all), capture

  * `.explain("formatted")` text -> plans/<tag>/<name>.txt
  * wall time of the noop-sink write (bench.py methodology), twice
  * Spark job count per run (statusTracker id delta) -- how many
    actions/barriers the entry triggers beyond the single noop write
  * plan-shape counters: Exchange / BroadcastExchange / Scan counts,
    BatchEvalPython / ArrowEvalPython / MapInArrow nodes, join kinds

Usage:
  python tools/entry_profile.py --tag r12_before [--plans-dir plans/r12] \
      [name ...]

Writes one JSON line per entry to stdout and a summary JSON to
.profile/<tag>.json.  Timing methodology matches bench.py (warm
session, noop sink, best-of-2) so numbers are comparable.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ergo_uexplorer_spark.session import get_spark  # noqa: E402
from ergo_uexplorer_spark.suite import REGISTRY  # noqa: E402

_PLAN_COUNTERS = {
    "exchanges": r"\bExchange\b",
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "scans": r"Scan parquet|FileScan parquet",
    "smj": r"SortMergeJoin",
    "bhj": r"BroadcastHashJoin",
    "shj": r"ShuffledHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "python_eval": r"BatchEvalPython|ArrowEvalPython",
    "map_in_arrow": r"MapInArrow|MapInPandas|FlatMapGroupsInPandas",
    "window": r"\bWindow\b",
    "sorts": r"\bSort\b",
}


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def profile(names, tag: str, plans_dir: str | None) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("uexplorer-entry-profile")
    sc = spark.sparkContext
    import bench

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    # warm codegen/JVM with the cheapest entry, as bench.py does
    first = sorted(REGISTRY)[0]
    try:
        REGISTRY[first].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc!r}", file=sys.stderr)

    out = {}
    for name in names:
        fn = bench._RAW_FN.get(name) or REGISTRY[name].fn
        rec: dict = {"name": name}
        try:
            sc.setJobDescription(f"profile:{name}")
            times = []
            jobs = []
            for _ in range(2):
                before_ids = set(sc.statusTracker().getJobIdsForGroup(None))
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t_build = time.perf_counter() - t0
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                after_ids = set(sc.statusTracker().getJobIdsForGroup(None))
                times.append(round(dt, 3))
                jobs.append(len(after_ids - before_ids))
                rec["build_s"] = round(t_build, 3)
            plan = _plan_text(df)
            if plans_dir:
                suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "")
                with open(
                    os.path.join(plans_dir, f"{name}{suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan)
            for key, pat in _PLAN_COUNTERS.items():
                rec[key] = len(re.findall(pat, plan))
            rec["times"] = times
            rec["best"] = min(times)
            rec["jobs_per_run"] = jobs
        except Exception as exc:  # noqa: BLE001
            rec["err"] = repr(exc)[:300]
        finally:
            sc.setJobDescription(None)
        out[name] = rec
        print(json.dumps(rec), flush=True)

    os.makedirs(os.path.join(REPO, ".profile"), exist_ok=True)
    with open(os.path.join(REPO, ".profile", f"{tag}.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    tag = "profile"
    plans_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--plans-dir":
            plans_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = sorted(REGISTRY)
    profile(names, tag, plans_dir)


if __name__ == "__main__":
    main()
