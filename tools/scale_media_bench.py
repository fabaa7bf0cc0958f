"""m01 multimodal decode throughput at real byte volume (r10 VERDICT
next-round #5): the 10× row-count soak ran in the fixed-cost regime
(~KB blobs), so the Arrow bytes/s cost model was unmeasured. This tool
generates a few hundred MB of REAL uncompressed containers (PPM P6
images + RIFF/WAVE 16-bit PCM) in the executors, runs the production
`extract_features(real_decode)` path over them, and prints the
decode+feature throughput per core plus the projected 100 TB decode
budget.

Generation is deterministic (numpy PCG64 seeded by media_id) and
happens inside mapInPandas — the driver never holds blobs, same as the
production posture. Fixture parquet is reused under .bench/media_scale.

Usage: python tools/scale_media_bench.py [--images 400] [--wavs 300]
Prints one JSON line; results recorded in SCALE.md's multimodal section.
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench",
    "media_scale",
)

IMG_SIDE = 384  # 384×384×3 ≈ 442 KB per P6 image
WAV_SECONDS = 2  # 2 s stereo 16-bit 44.1 kHz ≈ 353 KB per clip


def _gen_media(batches):
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for mid, kind in zip(pdf["media_id"], pdf["kind"]):
            rng = np.random.default_rng(int(mid))
            if kind == "image":
                px = rng.integers(
                    0, 256, size=IMG_SIDE * IMG_SIDE * 3, dtype=np.uint8
                )
                blob = (
                    f"P6\n{IMG_SIDE} {IMG_SIDE}\n255\n".encode()
                    + px.tobytes()
                )
                meta = (IMG_SIDE, IMG_SIDE, None, "ppm")
            else:
                rate, ch = 44_100, 2
                n = rate * ch * WAV_SECONDS
                samples = rng.integers(
                    -32768, 32768, size=n, dtype=np.int16
                )
                data = samples.astype("<i2").tobytes()
                fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2,
                                  ch * 2, 16)
                blob = (
                    b"RIFF"
                    + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<I", len(fmt))
                    + fmt
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                meta = (None, None, WAV_SECONDS * 1000, "wav")
            rows.append((int(mid), kind, blob, meta))
        yield pd.DataFrame(
            rows, columns=["media_id", "media_type", "content", "meta"]
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=400)
    ap.add_argument("--wavs", type=int, default=300)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ergo_uexplorer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        real_decode,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    if not os.path.exists(os.path.join(FIXTURE, "_SUCCESS")):
        seeds = spark.range(args.images + args.wavs).select(
            F.col("id").alias("media_id"),
            F.when(F.col("id") < args.images, F.lit("image"))
            .otherwise(F.lit("audio"))
            .alias("kind"),
        )
        (
            seeds.repartition(cpus)
            .mapInPandas(_gen_media, MEDIA_SCHEMA)
            .write.mode("overwrite")
            .parquet(FIXTURE)
        )
    media = spark.read.parquet(FIXTURE)
    n_rows = media.count()
    total_bytes = media.select(
        F.sum(F.length("content")).alias("b")
    ).collect()[0]["b"]

    feats = extract_features(media, decode_fn=real_decode)
    feats.write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(3):
        t0 = time.time()
        feats.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    mb = total_bytes / 1e6
    mb_s = mb / best
    mb_s_core = mb_s / cpus
    # projected 100 TB decode budget, in core-hours
    core_h_100tb = (100e12 / 1e6) / mb_s_core / 3600
    out = {
        "rows": n_rows,
        "total_mb": round(mb, 1),
        "wall_s": round(best, 2),
        "mb_per_s": round(mb_s, 1),
        "mb_per_s_per_core": round(mb_s_core, 2),
        "core_hours_100tb": round(core_h_100tb, 0),
        "cpus": cpus,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
