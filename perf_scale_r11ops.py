"""Measured scaling curve for the round-11 promotion (PERF.md): the
IVF learned-bucket cosine near-dup tier, 1x vs 10x corpus.

Claim under test (the honest caveat in PERF.md round 11): with FIXED
(n_centroids, nprobe), same-cell candidate mass grows ~quadratically
as the corpus outgrows its cell count — the scale knob is n_centroids
tracking corpus size (constant average cell occupancy), which restores
~linear candidate growth. This probe measures all three points:

    x1  corpus, ncent=64          (the shipped sf-fixture config)
    x10 corpus, ncent=64          (the fixed-knob quadratic failure)
    x10 corpus, ncent=640         (the knob turned: cells track N)

The 10x corpus replicates embeddings with per-replica COMPONENT
ROTATION (norm-preserving, decorrelates replicas — near-dup structure
stays per-replica instead of collapsing into 10-cliques) and offset
ids. Derived data lands under _artifacts/scale_r11ops.

Usage:  python perf_scale_r11ops.py          # one JSON line per config
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = 2


def _shuffle_totals(ui: str) -> tuple[int, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vector_search_ner_spark.operators import neardup as nd

    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_artifacts", "scale_r11ops"
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4053")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4053"

    emb = spark.read.parquet(os.path.join(base_sf, "embeddings.parquet"))
    dim = 64
    for mult in (1, 10):
        out = os.path.join(root, f"scale{mult}", "embeddings.parquet")
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        ee = emb
        if mult == 10:
            reps = []
            for i in range(10):
                rot = (
                    F.concat(
                        F.slice(F.col("embedding"), i * 6 + 1, dim - i * 6),
                        F.slice(F.col("embedding"), 1, i * 6),
                    )
                    if i
                    else F.col("embedding")
                )
                reps.append(
                    emb.select(
                        (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                        rot.alias("embedding"),
                        "label",
                    )
                )
            ee = reps[0]
            for r in reps[1:]:
                ee = ee.unionByName(r)
        ee.write.mode("overwrite").parquet(out)

    configs = [
        (1, nd.IVF_NEARDUP_NCENT),
        (10, nd.IVF_NEARDUP_NCENT),  # fixed knob: the quadratic trap
        (10, nd.IVF_NEARDUP_NCENT * 10),  # cells track N: the scale path
    ]
    for mult, ncent in configs:
        src = os.path.join(root, f"scale{mult}", "embeddings.parquet")
        best, sh, n_pairs = None, None, None
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            frame = nd.ivf_cosine_neardup_pairs(
                spark.read.parquet(src), 0.4, n_clusters=ncent
            )
            r0, w0 = _shuffle_totals(ui)
            t0 = time.perf_counter()
            frame.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            r1, w1 = _shuffle_totals(ui)
            if best is None or dt < best:
                best, sh = dt, (r1 - r0, w1 - w0)
        n_pairs = nd.ivf_cosine_neardup_pairs(
            spark.read.parquet(src), 0.4, n_clusters=ncent
        ).count()
        print(
            json.dumps(
                {
                    "metric": "ivf_neardup_scaling",
                    "corpus_mult": mult,
                    "n_centroids": ncent,
                    "wall_sec": round(best, 3),
                    "n_pairs": n_pairs,
                    "shuffle_read_mb": round(sh[0] / 1e6, 2),
                    "shuffle_write_mb": round(sh[1] / 1e6, 2),
                    "runs": N_RUNS,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
