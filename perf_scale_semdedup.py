"""Measured scaling curve for SemDeDup (PERF.md) — the O(sum c_i^2)
contract with the CLUSTER COUNT as the knob.

`dedup_semantic_prune`'s docstring claims the pairwise cosine sweep is
confined within clusters, so cost is O(sum c_i^2) and the cluster
count bounds c_i at 100 TB (the SemDeDup paper's own design point:
~10k clusters for ~100M docs). This script MEASURES both sides of
that claim on the sf0.1 embedding table (2,000 x 64-dim) vs a 10x
derivation (20,000 vectors):

  leg "fixed_k":   n_cent = 16 at BOTH scales. c_i grows 10x, so the
                   within-cluster pair count grows ~100x — wall and
                   shuffle should grow clearly super-linearly. This is
                   the MIS-CONFIGURED deployment the knob exists to
                   avoid.
  leg "scaled_k":  n_cent = 16 at 1x, 160 at 10x. c_i stays ~constant,
                   pair count grows ~10x — wall should be ~linear in
                   the corpus. This is the paper's configuration.

The 10x table derives by replication with a PER-REPLICA ELEMENT
ROTATION of the embedding array (replica i shifts the 64 components by
i positions): norms are preserved, cross-replica cosine is decorrelated,
so the 10x corpus has the same intra-cluster similarity character as
the base rather than 10 stacked exact duplicates. vec_ids remap to
replica*10_000_000 + vec_id. Derived data lands under _artifacts/.

Methodology per the bench-noise discipline: best-of-3 wall, shuffle
totals from the status REST API, nothing else running on the box.

Usage:  python perf_scale_semdedup.py     # one JSON line per leg
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
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vector_search_ner_spark.plans.queries_mlops import (
        semantic_prune_frame,
        semantic_prune_greedy_frame,
    )
    from vector_search_ner_spark.sources.catalog import load_table

    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_artifacts", "scale_semdedup"
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

    emb = load_table(spark, base_sf, "embeddings")
    scales = {1: emb}
    replicas = []
    for i in range(10):
        rot = F.concat(
            F.slice(F.col("embedding"), i + 1, DIM - i),
            F.slice(F.col("embedding"), 1, i),
        ) if i else F.col("embedding")
        replicas.append(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                rot.alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    ten = replicas[0]
    for r in replicas[1:]:
        ten = ten.unionByName(r)
    scales[10] = ten
    for mult, df in scales.items():
        out = os.path.join(root, f"scale{mult}")
        shutil.rmtree(out, ignore_errors=True)
        df.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    legs = {
        "semdedup_fixed_k": ("conservative", {1: 16, 10: 16}),
        "semdedup_scaled_k": ("conservative", {1: 16, 10: 160}),
        # the greedy twin at the paper's configuration: the extra cost
        # over the conservative sweep is the driver-gated frontier
        # rounds, whose count is dependency-chain depth — the measured
        # ratio must stay in the conservative leg's class, showing the
        # loop does NOT add a corpus-proportional term
        "semdedup_greedy_scaled_k": ("greedy", {1: 16, 10: 160}),
    }
    # fourth leg — the incremental serving shape: a FIXED shard (the
    # 1x table's vec_id%10==5 slice) probed against the PERSISTED
    # semantic index of a 1x vs 10x existing corpus (clusters scaled
    # with the corpus so avg cluster size is constant). Store build is
    # paid once OUTSIDE the timed runs; the timed work is shard
    # assignment + probing only the assigned clusters, so wall should
    # be ~flat — the semantic twin of the incremental-LSH 0.93x leg.
    from vector_search_ner_spark.plans.queries_mlops import (
        semantic_incremental_frame,
    )
    from vector_search_ner_spark.sources.semdedup_index import semantic_index_store
    from vector_search_ner_spark.functions.vector import to_double_array

    stores = {
        mult: semantic_index_store(
            spark, os.path.join(root, f"scale{mult}"), k, 2, 10, 5
        )
        for mult, k in ((1, 16), (10, 160))
    }
    fixed_shard = (
        spark.read.parquet(os.path.join(root, "scale1", "embeddings.parquet"))
        .where(F.col("vec_id") % 10 == 5)
        .select(
            F.col("vec_id").alias("doc_id"),
            to_double_array(F.col("embedding")).alias("v"),
        )
    )

    def incremental_fixed_shard(mult):
        members, centroids = stores[mult]
        return semantic_incremental_frame(fixed_shard, members, centroids)

    results = {}
    for mult in (1, 10):
        best, sh = None, None
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            r0, w0 = _shuffle_totals(ui)
            t0 = time.perf_counter()
            incremental_fixed_shard(mult).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            r1, w1 = _shuffle_totals(ui)
            if best is None or dt < best:
                best, sh = dt, (r1 - r0, w1 - w0)
        results[f"x{mult}"] = {
            "n_vecs": 2000 * mult,
            "wall_sec": round(best, 3),
            "shuffle_read_mb": round(sh[0] / 1e6, 2),
            "shuffle_write_mb": round(sh[1] / 1e6, 2),
            "runs": N_RUNS,
        }
    print(
        json.dumps(
            {
                "metric": "semdedup_scaling",
                "leg": "semdedup_incremental_fixed_shard",
                "base_sf_dir": base_sf,
                "scales": results,
                "wall_ratio_10x_over_1x": round(
                    results["x10"]["wall_sec"] / results["x1"]["wall_sec"], 2
                ),
            }
        )
    )

    for qname, (variant, k_by_mult) in legs.items():
        results = {}
        for mult in (1, 10):
            sf_dir = os.path.join(root, f"scale{mult}")
            table = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            n = table.count()
            best, sh = None, None
            for _ in range(N_RUNS):
                spark.catalog.clearCache()
                r0, w0 = _shuffle_totals(ui)
                t0 = time.perf_counter()
                frame_fn = (
                    semantic_prune_greedy_frame if variant == "greedy"
                    else semantic_prune_frame
                )
                frame_fn(table, n_cent=k_by_mult[mult]).write.mode(
                    "overwrite"
                ).format("noop").save()
                dt = time.perf_counter() - t0
                r1, w1 = _shuffle_totals(ui)
                if best is None or dt < best:
                    best, sh = dt, (r1 - r0, w1 - w0)
            results[f"x{mult}"] = {
                "n_vecs": n,
                "n_cent": k_by_mult[mult],
                "wall_sec": round(best, 3),
                "shuffle_read_mb": round(sh[0] / 1e6, 2),
                "shuffle_write_mb": round(sh[1] / 1e6, 2),
                "runs": N_RUNS,
            }
        r1x, r10x = results["x1"], results["x10"]
        print(
            json.dumps(
                {
                    "metric": "semdedup_scaling",
                    "leg": qname,
                    "base_sf_dir": base_sf,
                    "scales": results,
                    "wall_ratio_10x_over_1x": round(
                        r10x["wall_sec"] / r1x["wall_sec"], 2
                    ),
                    "shuffle_write_ratio_10x_over_1x": round(
                        r10x["shuffle_write_mb"] / max(r1x["shuffle_write_mb"], 1e-9), 2
                    ),
                }
            )
        )

    # fifth leg — the ADVERSARIAL giant cluster (round 9): every
    # embedding IDENTICAL, so Lloyd collapses the whole corpus into
    # one cluster regardless of n_cent and the uncapped pairwise term
    # is O(n^2) (2M pairs at 1x, 200M at 10x — the 100x blowup the
    # r8 verdict flagged). With the rank cap the comparison side is
    # the cluster's `cap` most-central members: pair count is n*cap,
    # so wall at 10x data must grow ~linearly (~10x pair count), not
    # ~100x. cap=256 here (vs the registered default 1024) keeps the
    # leg quick while still 8x the non-degenerate cluster size.
    const_vec = F.array(*[F.lit(1.0 + (i % 5)) for i in range(DIM)]).cast(
        "array<float>"
    )
    for mult in (1, 10):
        src = spark.read.parquet(
            os.path.join(root, f"scale{mult}", "embeddings.parquet")
        )
        out = os.path.join(root, f"giant{mult}")
        shutil.rmtree(out, ignore_errors=True)
        src.select("vec_id", const_vec.alias("embedding")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "embeddings.parquet"))
    results = {}
    for mult in (1, 10):
        table = spark.read.parquet(
            os.path.join(root, f"giant{mult}", "embeddings.parquet")
        )
        n = table.count()
        best, sh = None, None
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            r0, w0 = _shuffle_totals(ui)
            t0 = time.perf_counter()
            semantic_prune_frame(table, n_cent=16, cap=256).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = time.perf_counter() - t0
            r1, w1 = _shuffle_totals(ui)
            if best is None or dt < best:
                best, sh = dt, (r1 - r0, w1 - w0)
        results[f"x{mult}"] = {
            "n_vecs": n,
            "n_cent": 16,
            "cap": 256,
            "wall_sec": round(best, 3),
            "shuffle_read_mb": round(sh[0] / 1e6, 2),
            "shuffle_write_mb": round(sh[1] / 1e6, 2),
            "runs": N_RUNS,
        }
    print(
        json.dumps(
            {
                "metric": "semdedup_scaling",
                "leg": "semdedup_giant_cluster_capped",
                "base_sf_dir": base_sf,
                "scales": results,
                "wall_ratio_10x_over_1x": round(
                    results["x10"]["wall_sec"] / results["x1"]["wall_sec"], 2
                ),
            }
        )
    )

    # sixth leg — the greedy sweep's CHAIN-DEPTH vs threshold probe
    # (round 9): the frontier loop's round count equals the longest
    # undecided dependency chain. At the shipped T=0.4 that is ~2-3;
    # an aggressive threshold on a redundant corpus lengthens chains
    # (every doc similar to its predecessor), and this probe
    # documents the knob's failure edge — how fast driver rounds grow
    # as T drops — before a user finds it. Edge/target counts are
    # reported alongside so the O(similar-docs) loop-state claim is
    # measurable at each threshold.
    from vector_search_ner_spark.plans.queries_mlops import (
        _semdedup_members,
        _semdedup_edges,
        greedy_sweep_fixpoint,
    )

    table = spark.read.parquet(os.path.join(root, "scale1", "embeddings.parquet"))
    j = _semdedup_members(table, n_cent=16, n_iter=2)
    probe = {}
    for t in (0.4, 0.25, 0.15, 0.05):
        t0 = time.perf_counter()
        edges = _semdedup_edges(j, cap=1024, t=t)
        n_edges = edges.count()
        n_targets = edges.select("b_id").distinct().count()
        _, rounds = greedy_sweep_fixpoint(edges)
        probe[f"t{t}"] = {
            "n_edges": n_edges,
            "n_targets": n_targets,
            "sweep_rounds": rounds,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }
    print(
        json.dumps(
            {
                "metric": "semdedup_scaling",
                "leg": "semdedup_greedy_chain_depth_vs_threshold",
                "base_sf_dir": base_sf,
                "thresholds": probe,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
