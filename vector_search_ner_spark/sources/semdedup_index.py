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
from vector_search_ner_spark.operators import veckernel as vk
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
# v3: members carry `ark` — the assignment rank. store_nprobe >= 2
# multi-assigns each vector to its top-store_nprobe cells INDEX-SIDE
# (r12: the incremental cosine twin's recall knee was single stored
# assignments; the both-sides probing scheme of the batch op needs
# the store to multi-assign too). store_nprobe=1 keeps v2 content
# exactly (ark == 1 everywhere).
SEMDEDUP_INDEX_VERSION = 3


def _index_path(
    sf_dir: str,
    n_cent: int,
    n_iter: int,
    exclude_mod: int,
    exclude_rem: int,
    store_nprobe: int = 1,
) -> str:
    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{src}:{_source_fingerprint(src)}:k{n_cent}i{n_iter}"
        f"m{exclude_mod}r{exclude_rem}p{store_nprobe}"
        f":v{SEMDEDUP_INDEX_VERSION}".encode()
    ).hexdigest()[:16]
    corpus = sf_dir.strip("/").replace("/", "_")
    return os.path.join(
        ARTIFACT_DIR,
        "semdedup_index",
        f"{corpus}_k{n_cent}m{exclude_mod}r{exclude_rem}p{store_nprobe}",
        key,
    )


def semantic_index_store(
    spark: SparkSession,
    sf_dir: str,
    n_cent: int,
    n_iter: int,
    exclude_mod: int = 10,
    exclude_rem: int = 5,
    store_nprobe: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Open (building once if absent) the persisted semantic cluster
    index over the EXISTING corpus — every vector EXCEPT the held-out
    shard `vec_id % exclude_mod == exclude_rem` (the shard plays the
    "new data" role in `dedup_semantic_incremental`).

    Returns (members, centroids) as plain parquet reads: members carry
    (doc_id, v double-array, u, ark, rn, cluster_id) partitioned BY
    cluster_id — u is the microunit centroid distance OF THAT
    ASSIGNMENT, ark the assignment rank (1 = nearest cell; rows with
    ark <= k are the top-k multi-assignment), rn the within-cluster
    centrality rank by (u, doc_id), so probe-time giant-cluster caps
    (`rn <= cap`) are plain pushable filters; centroids carry
    (cluster_id, centroid). Consumers' plans show scans of this
    store, never a re-clustering of the corpus."""
    path = _index_path(
        sf_dir, n_cent, n_iter, exclude_mod, exclude_rem, store_nprobe
    )
    members_path = os.path.join(path, "members")
    centroids_path = os.path.join(path, "centroids")
    if not os.path.exists(os.path.join(members_path, "_SUCCESS")):
        from pyspark.sql import Window

        from vector_search_ner_spark.functions.vector import to_double_array

        corpus = load_table(spark, sf_dir, "embeddings").where(
            F.col("vec_id") % exclude_mod != exclude_rem
        )
        _assigned, centroids = ann.lloyd_build(corpus, n_cent, n_iter=n_iter)
        # centroids first (no _SUCCESS dependency on them — members'
        # marker is the swap gate), then the partitioned member table.
        # Multi-assignment runs in the Arrow kernel (bit-identical to
        # the retired crossJoin + interpreted fold + rank window —
        # veckernel contract); the centrality rank window stays JVM.
        centroids.write.mode("overwrite").parquet(centroids_path)
        docs = corpus.select(
            F.col("vec_id").alias("doc_id"),
            to_double_array(F.col("embedding")).alias("v"),
        )
        (
            vk.assign_topm(
                docs, centroids, store_nprobe, "v",
                dist_col="__dist", ark_col="ark",
            )
            .withColumn("u", F.floor(F.col("__dist") * 1000000).cast("long"))
            .withColumn(
                "rn",
                F.row_number()
                .over(Window.partitionBy("cluster_id").orderBy("u", "doc_id"))
                .cast("long"),
            )
            .select("doc_id", "v", "u", "ark", "rn", "cluster_id")
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


# delta members appended by the streaming path carry this rank
# sentinel: until the next compaction recomputes within-cluster
# centrality ranks over the merged generation, appended members are
# BEYOND every probe cap by definition (they can be dropped against
# the index, but never act as comparison sources — the conservative
# direction).
DELTA_RANK_SENTINEL = 1 << 62


def assign_members_frame(shard: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign a shard of (doc_id, v double-array) vectors to the
    PERSISTED centroids (broadcast — tiny) and attach the microunit
    centroid distance `u`, yielding rows in the member-table schema
    with the delta rank sentinel. Shared by the streaming append and
    the staleness report, and the exact arithmetic the store build and
    its DuckDB oracle use (argmin by squared L2, cluster_id tie-break
    — the Arrow kernel reproduces both bit-for-bit)."""
    return vk.assign_topm(shard, centroids, 1, "v", dist_col="cdist").select(
        "doc_id",
        "v",
        F.floor(F.col("cdist") * 1000000).cast("long").alias("u"),
        F.lit(1).cast("long").alias("ark"),
        F.lit(DELTA_RANK_SENTINEL).alias("rn"),
        "cluster_id",
    )


def semantic_index_summary_frame(members: DataFrame, centroids: DataFrame) -> DataFrame:
    """Canonical content summary of a semantic cluster index: per
    cluster the member count, doc_id sum, and a bit_xor checksum over
    stable hashes of 'doc_id:u' (u = microunit centroid distance —
    any drift in a member's vector-to-centroid geometry flips the
    checksum), plus a cluster_id=-1 row checksumming the centroids
    themselves (microunit-floored, dimension-ordered stringification —
    engine-neutral doubles). A DuckDB oracle re-deriving the same
    summary from the raw corpus certifies the persisted/streamed index
    content bit-for-bit, the exact contract index_summary_frame gives
    the near-dup store."""
    from vector_search_ner_spark.functions.text import stable_long_hash

    mem = (
        members.select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            "doc_id",
            stable_long_hash(
                F.concat_ws(":", F.col("doc_id").cast("string"), F.col("u").cast("string"))
            ).alias("__h"),
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("doc_id").cast("long").alias("sid_sum"),
            F.expr("bit_xor(__h)").alias("content_xor"),
        )
    )
    cent = centroids.select(
        F.col("cluster_id").cast("long").alias("cid"),
        stable_long_hash(
            F.array_join(
                F.transform(
                    F.col("centroid"), lambda x: F.floor(x * 1000000).cast("string")
                ),
                ",",
            )
        ).alias("__h"),
    ).agg(
        F.lit(-1).cast("int").alias("cluster_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.sum("cid").cast("long").alias("sid_sum"),
        F.expr("bit_xor(__h)").alias("content_xor"),
    )
    return mem.unionByName(cent).orderBy("cluster_id")
