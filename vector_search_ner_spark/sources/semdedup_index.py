"""Persisted SEMANTIC dedup index — the embedding-space analogue of
`sources/neardup_index.py`'s shingle/minhash store.

SemDeDup's decision needs each new document compared only against the
members of its own semantic cluster. At daily-ingest cadence the
existing corpus's clustering must therefore be a PERSISTED artifact:
Lloyd centroids (tiny, broadcast at probe time) plus the member
vectors laid out `partitionBy(cluster_id)`, so a new shard's probe
reads only the clusters it assigns to (partition pruning by layout —
the same discipline as `ann_ivf_persisted_pruned`), never the whole
index, and the corpus is never re-clustered per shard.

Freshness mirrors the neardup store: the generation key fingerprints
the source parquet (part-file mtimes/sizes for directory sources),
the corpus split, and a VERSION constant; retirement is
write-then-swap (older generations removed only after the new build's
members _SUCCESS marker lands). The quantizer is the fully
SQL-reproducible `ann.lloyd_build`, so consumers keep complete DuckDB
oracles that re-derive the index from first principles.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.operators import ann
from vector_search_ner_spark.sources.catalog import load_table
from vector_search_ner_spark.sources.neardup_index import (
    ARTIFACT_DIR,
    _source_fingerprint,
)

# bump when the quantizer (iterations, microunit scale) or the store
# schema changes
# v2: members carry (u, rn) — the microunit centroid distance and the
# within-cluster centrality rank — so probe-time giant-cluster caps
# are a pushable `rn <= cap` filter, not a window over the index
SEMDEDUP_INDEX_VERSION = 2


def _index_path(
    sf_dir: str, n_cent: int, n_iter: int, exclude_mod: int, exclude_rem: int
) -> str:
    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{src}:{_source_fingerprint(src)}:k{n_cent}i{n_iter}"
        f"m{exclude_mod}r{exclude_rem}:v{SEMDEDUP_INDEX_VERSION}".encode()
    ).hexdigest()[:16]
    corpus = sf_dir.strip("/").replace("/", "_")
    return os.path.join(
        ARTIFACT_DIR,
        "semdedup_index",
        f"{corpus}_k{n_cent}m{exclude_mod}r{exclude_rem}",
        key,
    )


def semantic_index_store(
    spark: SparkSession,
    sf_dir: str,
    n_cent: int,
    n_iter: int,
    exclude_mod: int = 10,
    exclude_rem: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Open (building once if absent) the persisted semantic cluster
    index over the EXISTING corpus — every vector EXCEPT the held-out
    shard `vec_id % exclude_mod == exclude_rem` (the shard plays the
    "new data" role in `dedup_semantic_incremental`).

    Returns (members, centroids) as plain parquet reads: members carry
    (doc_id, v double-array, u, rn, cluster_id) partitioned BY
    cluster_id — u is the microunit centroid distance and rn the
    within-cluster centrality rank by (u, doc_id), so probe-time
    giant-cluster caps (`rn <= cap`) are plain pushable filters;
    centroids carry (cluster_id, centroid). Consumers' plans show
    scans of this store, never a re-clustering of the corpus."""
    path = _index_path(sf_dir, n_cent, n_iter, exclude_mod, exclude_rem)
    members_path = os.path.join(path, "members")
    centroids_path = os.path.join(path, "centroids")
    if not os.path.exists(os.path.join(members_path, "_SUCCESS")):
        from pyspark.sql import Window

        from vector_search_ner_spark.functions.vector import to_double_array

        corpus = load_table(spark, sf_dir, "embeddings").where(
            F.col("vec_id") % exclude_mod != exclude_rem
        )
        assigned, centroids = ann.lloyd_build(corpus, n_cent, n_iter=n_iter)
        # centroids first (no _SUCCESS dependency on them — members'
        # marker is the swap gate), then the partitioned member table
        centroids.write.mode("overwrite").parquet(centroids_path)
        sq = lambda a, b: F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        (
            assigned.select(
                F.col("vec_id").alias("doc_id"),
                to_double_array(F.col("embedding")).alias("v"),
                "cluster_id",
            )
            .join(F.broadcast(centroids), "cluster_id")
            .withColumn(
                "u", F.floor(sq(F.col("v"), F.col("centroid")) * 1000000).cast("long")
            )
            .withColumn(
                "rn",
                F.row_number()
                .over(Window.partitionBy("cluster_id").orderBy("u", "doc_id"))
                .cast("long"),
            )
            .select("doc_id", "v", "u", "rn", "cluster_id")
        ).write.mode("overwrite").partitionBy("cluster_id").parquet(members_path)
        # write-then-swap: retire older generations only after the new
        # build's members marker lands (crash mid-build keeps the
        # previous generation serveable)
        parent = os.path.dirname(path)
        if os.path.exists(os.path.join(members_path, "_SUCCESS")):
            import shutil

            for old in os.listdir(parent):
                if old != os.path.basename(path):
                    shutil.rmtree(os.path.join(parent, old), ignore_errors=True)
    return spark.read.parquet(members_path), spark.read.parquet(centroids_path)
