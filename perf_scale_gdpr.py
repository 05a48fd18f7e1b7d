"""Measured scaling curve for the GDPR delete cascade (PERF.md).

`gdpr_delete_cascade`'s contract: the deletion set is request-sized
and BROADCASTS into anti-joins against each persisted surface, so the
cascade's cost is one scan + one map-side-combining aggregate per
store — wall should grow ~linearly with store size (the audit must
read every survivor to checksum it) while SHUFFLE stays flat (only
the per-surface aggregate rows move). This script measures both at
1x vs 10x corpus scale.

The 10x corpus derives by replication: documents remap doc_id to
replica*10_000_000 + doc_id (text unchanged — the cascade binds
content by md5, it never compares across rows); embeddings remap
vec_id the same way with the per-replica element ROTATION of the
semdedup probe so the 10x semantic index has sane cluster geometry.
Both scales land under _artifacts/scale_gdpr/ and all three stores
(vecstore, shingle index, semantic index) are built OUTSIDE the timed
runs — the probe measures the cascade, not index construction.

Methodology per the bench-noise discipline: best-of-3 wall, shuffle
totals from the status REST API, nothing else running on the box.

Usage:  python perf_scale_gdpr.py     # one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = 3
DIM = 64


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

    from vector_search_ner_spark.plans.queries_dataprep import gdpr_delete_cascade
    from vector_search_ner_spark.sources.catalog import load_table

    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_artifacts", "scale_gdpr"
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4049"

    docs = load_table(spark, base_sf, "documents")
    emb = load_table(spark, base_sf, "embeddings")
    for mult in (1, 10):
        out = os.path.join(root, f"scale{mult}")
        shutil.rmtree(out, ignore_errors=True)
        d_parts, e_parts = [], []
        for i in range(mult):
            d_parts.append(
                docs.select(
                    (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                    *[c for c in docs.columns if c != "doc_id"],
                )
            )
            rot = (
                F.concat(
                    F.slice(F.col("embedding"), i + 1, DIM - i),
                    F.slice(F.col("embedding"), 1, i),
                )
                if i
                else F.col("embedding")
            )
            e_parts.append(
                emb.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                    rot.alias("embedding"),
                    *[c for c in emb.columns if c not in ("vec_id", "embedding")],
                )
            )
        d = d_parts[0]
        for p in d_parts[1:]:
            d = d.unionByName(p)
        e = e_parts[0]
        for p in e_parts[1:]:
            e = e.unionByName(p)
        d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
        e.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    # store builds outside the timed runs (first call builds all three)
    for mult in (1, 10):
        gdpr_delete_cascade(spark, os.path.join(root, f"scale{mult}")).write.mode(
            "overwrite"
        ).format("noop").save()

    results = {}
    for mult in (1, 10):
        sf_dir = os.path.join(root, f"scale{mult}")
        n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
        best, sh = None, None
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            r0, w0 = _shuffle_totals(ui)
            t0 = time.perf_counter()
            gdpr_delete_cascade(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            r1, w1 = _shuffle_totals(ui)
            if best is None or dt < best:
                best, sh = dt, (r1 - r0, w1 - w0)
        results[f"x{mult}"] = {
            "n_docs": n_docs,
            "wall_sec": round(best, 3),
            "shuffle_read_mb": round(sh[0] / 1e6, 2),
            "shuffle_write_mb": round(sh[1] / 1e6, 2),
            "runs": N_RUNS,
        }
    print(
        json.dumps(
            {
                "metric": "gdpr_cascade_scaling",
                "base_sf_dir": base_sf,
                "scales": results,
                "wall_ratio_10x_over_1x": round(
                    results["x10"]["wall_sec"] / results["x1"]["wall_sec"], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
