"""Measured scaling curves for the round-10 operators (PERF.md): the
rung-0 source-curation family and the unigram-LM tokenizer trainer.

Claims under test (each query's docstring):
  * source_reputation_report — ONE map-side-combining hash agg keyed
    by source: at 10x docs (same 20 sources), wall ~linear, shuffle
    ~flat (only per-source aggregate rows cross the wire).
  * source_quota_enforce — per-SOURCE window over a slim projection:
    at 10x docs per source, wall ~linear (each source's range sort
    grows linearly, sources sort independently), output FIXED (the
    quota admits the same prefix regardless of tail size).
  * unigram_train_vocab — the corpus is scanned ONCE (word-frequency
    agg); every EM round runs over the |vocab| x word-length lattice:
    at 10x docs (vowel-rotated replicas -> 10x distinct words but the
    same word-length bound), wall grows FAR below 10x — the flat
    vocab-round cost dominates.

The 10x corpus uses the perf_scale_dedup vowel-rotation derivation
(replicas textually distinct, so the reputation dup-rate stays 0 at
both scales and the word inventory genuinely grows). Derived data
lands under _artifacts/scale_r10ops.

Usage:  python perf_scale_r10ops.py          # one JSON line per leg
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
        os.path.dirname(os.path.abspath(__file__)), "_artifacts", "scale_r10ops"
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4052")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4052"

    docs = load_table(spark, base_sf, "documents")
    for mult in (1, 10):
        out = os.path.join(root, f"scale{mult}")
        shutil.rmtree(out, ignore_errors=True)
        dd = docs
        if mult == 10:
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
        dd.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    queries, _ = registry.collect()
    legs = [
        "source_reputation_report",
        "source_quota_enforce",
        "unigram_train_vocab",
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
                    "metric": "r10ops_leg_scaling",
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
