"""Measured scaling curve for the round-12 knob promotion (PERF.md):
the CORPUS-ADAPTIVE IVF cosine near-dup quantizer, 1x vs 10x corpus.

Round 11 shipped a fixed ncent=64 whose own x10 probe
(perf_scale_r11ops.py) convicted it: 34x wall / 94x shuffle at 10x
corpus (same-cell candidate mass ~ N^2/ncent). Round 12 derives the
knob from the corpus (ncent = ceil(N/occ) clamped, nprobe = capped
ceil-cbrt tier — operators/neardup.py:adaptive_ncent/adaptive_nprobe)
so candidate mass is ~ N * occ * nprobe^2 / 2 — LINEAR in N once the
nprobe cap binds. This probe measures three points:

    x1  corpus, adaptive knob        (what the op derives: sf0.1 ->
                                      ncent 250, nprobe 6)
    x10 corpus, knob FROZEN at x1's  (the r11-style trap restated at
                                      the new base: 250 cells for
                                      20,000 vectors)
    x10 corpus, adaptive knob        (ncent 2500, nprobe 6 — the
                                      shipping default at that size)

Corpus replication is identical to perf_scale_r11ops.py (per-replica
norm-preserving component rotation + offset ids); derived data lands
under _artifacts/scale_r11ops (shared with the r11 probe).

Usage:  python perf_scale_r12ops.py          # one JSON line per config
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
        .config("spark.ui.port", "4054")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4054"

    emb = spark.read.parquet(os.path.join(base_sf, "embeddings.parquet"))
    dim = 64
    for mult in (1, 10):
        out = os.path.join(root, f"scale{mult}", "embeddings.parquet")
        if os.path.exists(out):
            continue  # shared with perf_scale_r11ops.py
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

    n_base = spark.read.parquet(
        os.path.join(root, "scale1", "embeddings.parquet")
    ).count()
    frozen_ncent = nd.adaptive_ncent(n_base)
    frozen_np = nd.adaptive_nprobe(frozen_ncent)
    configs = [
        (1, None, None, "adaptive"),
        (10, frozen_ncent, frozen_np, "frozen_at_x1"),  # the trap restated
        (10, None, None, "adaptive"),
    ]
    for mult, ncent, np_, label in configs:
        src = os.path.join(root, f"scale{mult}", "embeddings.parquet")
        best, sh = None, None
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            frame = nd.ivf_cosine_neardup_pairs(
                spark.read.parquet(src), 0.4, n_clusters=ncent, nprobe=np_
            )
            r0, w0 = _shuffle_totals(ui)
            t0 = time.perf_counter()
            frame.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            r1, w1 = _shuffle_totals(ui)
            if best is None or dt < best:
                best, sh = dt, (r1 - r0, w1 - w0)
        n_vec = spark.read.parquet(src).count()
        eff_nc = ncent if ncent is not None else nd.adaptive_ncent(n_vec)
        eff_np = np_ if np_ is not None else nd.adaptive_nprobe(eff_nc)
        n_pairs = nd.ivf_cosine_neardup_pairs(
            spark.read.parquet(src), 0.4, n_clusters=ncent, nprobe=np_
        ).count()
        print(
            json.dumps(
                {
                    "metric": "ivf_neardup_adaptive_scaling",
                    "corpus_mult": mult,
                    "knob": label,
                    "n_centroids": eff_nc,
                    "nprobe": eff_np,
                    "wall_sec": round(best, 3),
                    "n_pairs": n_pairs,
                    "shuffle_read_mb": round(sh[0] / 1e6, 2),
                    "shuffle_write_mb": round(sh[1] / 1e6, 2),
                    "runs": N_RUNS,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
