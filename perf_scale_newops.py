"""Measured scaling curves for the round-9 last-wave operators
(PERF.md): the Bloom runtime prefilter, the Count-Min grid, and the
in-engine perceptron trainer.

Claims under test (each query's docstring):
  * join_bloom_prefilter — probe is MAP-ONLY (broadcast bitmap joins,
    no fact shuffle): at 10x fact rows, wall ~linear, shuffle ~flat
    (only the tiny build-side aggregations shuffle).
  * sketch_countmin_topk — the grid is d*w rows REGARDLESS of corpus
    size: at 10x rows, wall ~linear, shuffle dominated by the one
    per-key exact agg (the certification side), grid cost flat.
  * quality_classifier_perceptron — each training round is one linear
    integer aggregation over the feature frame: at 10x docs, wall
    ~linear, shuffle ~flat (gradients are 1-row frames).

The 10x fact tables replicate rows verbatim (scaling work, not
changing key domains: the Bloom build side and the CMS key domain
stay fixed, which is exactly the production shape — a bigger fact
against the same dimension). The 10x documents corpus uses the
perf_scale_dedup vowel-rotation derivation so replicas stay mutually
invisible to any content logic. Derived data lands under _artifacts/.

Usage:  python perf_scale_newops.py          # one JSON line per leg
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
_ROT = "abcdefghijklmnopqrstuvwxyz0123456789"


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

    from vector_search_ner_spark import registry
    from vector_search_ner_spark.sources.catalog import load_table

    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_artifacts", "scale_newops"
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4051")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4051"

    lineitem = load_table(spark, base_sf, "lineitem")
    part = load_table(spark, base_sf, "part")
    docs = load_table(spark, base_sf, "documents")
    for mult in (1, 10):
        out = os.path.join(root, f"scale{mult}")
        shutil.rmtree(out, ignore_errors=True)
        li = lineitem
        dd = docs
        if mult == 10:
            li = lineitem
            for _ in range(9):
                li = li.unionByName(lineitem)
            reps = [
                docs.select(
                    (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                    F.translate("text", _ROT, _ROT[i:] + _ROT[:i]).alias("text"),
                    *[c for c in docs.columns if c not in ("doc_id", "text")],
                )
                for i in range(10)
            ]
            dd = reps[0]
            for r in reps[1:]:
                dd = dd.unionByName(r)
        li.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
        dd.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
        # the Bloom build side is the fixed dimension at both scales
        part.write.mode("overwrite").parquet(os.path.join(out, "part.parquet"))

    queries, _ = registry.collect()
    legs = [
        "join_bloom_prefilter",
        "sketch_countmin_topk",
        "quality_classifier_perceptron",
    ]
    for qname in legs:
        results = {}
        for mult in (1, 10):
            sf_dir = os.path.join(root, f"scale{mult}")
            best, sh = None, None
            for _ in range(N_RUNS):
                spark.catalog.clearCache()
                r0, w0 = _shuffle_totals(ui)
                t0 = time.perf_counter()
                queries[qname](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.perf_counter() - t0
                r1, w1 = _shuffle_totals(ui)
                if best is None or dt < best:
                    best, sh = dt, (r1 - r0, w1 - w0)
            results[f"x{mult}"] = {
                "wall_sec": round(best, 3),
                "shuffle_read_mb": round(sh[0] / 1e6, 2),
                "shuffle_write_mb": round(sh[1] / 1e6, 2),
                "runs": N_RUNS,
            }
        r1x, r10x = results["x1"], results["x10"]
        print(
            json.dumps(
                {
                    "metric": "newops_leg_scaling",
                    "query": qname,
                    "base_sf_dir": base_sf,
                    "scales": results,
                    "wall_ratio_10x_over_1x": round(
                        r10x["wall_sec"] / r1x["wall_sec"], 2
                    ),
                    "shuffle_write_ratio_10x_over_1x": round(
                        r10x["shuffle_write_mb"]
                        / max(r1x["shuffle_write_mb"], 1e-9),
                        2,
                    ),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
