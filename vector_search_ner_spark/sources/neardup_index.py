"""Persisted shingle/MinHash dedup index — the near-dup analogue of
`sources/vecstore.py`'s build-once document vector store.

The reference's v2 store separates indexing from serving: the corpus is
embedded and persisted once, and later ingests upsert INTO the existing
collection (`build_vectorstore.py:233-250`) rather than re-indexing the
world. The dedup family needs the same split: deduplicating a NEW shard
against a 100 TB corpus must not re-tokenize the corpus — it reads the
corpus's persisted band table and shingle sets, which are maintained as
first-class lakehouse artifacts.

Layout (two column-pruned parquet relations under one generation dir):

  bands/     (sid, band, key)   — the LSH posting table the candidate
                                  join probes; at cluster scale written
                                  bucketed/partitioned BY key so a new
                                  shard's broadcast probe is a
                                  co-located scan
  shingles/  (sid, hs)          — full 60-bit shingle-hash sets, read
                                  only for candidate verification

Freshness mirrors vecstore: the artifact key fingerprints the source
parquet (path + part-file mtimes/sizes for directory sources), the
corpus split, and a VERSION constant, so regenerated fixtures or a
hashing change retire stale generations — retirement is write-then-
swap (old generations removed only after the new build's _SUCCESS).
Everything stored is derived with the exact neardup operator exprs
(`token_hashes60`/`gram_hashes60`/`minhash_signature_cols`), so DuckDB
oracles that re-derive from first principles stay valid bit-for-bit.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ner_spark.operators import neardup as nd
from vector_search_ner_spark.session import cut_lineage
from vector_search_ner_spark.sources.catalog import load_table

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "_artifacts",
)

# bump when the shingle/minhash definition or the store schema changes
NEARDUP_INDEX_VERSION = 1


def _source_fingerprint(src: str) -> str:
    """Freshness fingerprint of the source parquet. For a single file,
    (mtime_ns, size). For a DIRECTORY-shaped corpus (Spark writes
    parquet as a dir of part files), stat'ing the directory inode only
    tracks entry renames — a part file rewritten in place under the
    same name leaves dir mtime/size unchanged and would serve a stale
    index — so fold in the max part-file mtime_ns and the total
    part-file byte count instead."""
    st = os.stat(src)
    if not os.path.isdir(src):
        return f"{st.st_mtime_ns}:{st.st_size}"
    max_mtime, total = 0, 0
    for root, _dirs, files in os.walk(src):
        for name in files:
            fst = os.stat(os.path.join(root, name))
            max_mtime = max(max_mtime, fst.st_mtime_ns)
            total += fst.st_size
    return f"d{max_mtime}:{total}"


def _index_path(sf_dir: str, exclude_mod: int, exclude_rem: int) -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{_source_fingerprint(src)}:m{exclude_mod}r{exclude_rem}"
        f":v{NEARDUP_INDEX_VERSION}".encode()
    ).hexdigest()[:16]
    corpus = sf_dir.strip("/").replace("/", "_")
    return os.path.join(
        ARTIFACT_DIR, "neardup_index", f"{corpus}_m{exclude_mod}r{exclude_rem}", key
    )


def shingle_index_store(
    spark: SparkSession,
    sf_dir: str,
    exclude_mod: int = 10,
    exclude_rem: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Open (building once if absent) the persisted shingle/minhash
    index over the EXISTING corpus — every document EXCEPT the held-out
    shard `doc_id % exclude_mod == exclude_rem` (the shard plays the
    "new data" role in `dedup_incremental_vs_index`).

    Returns (bands, shingles) as plain parquet reads — the consumer's
    plan shows parquet scans of this store, never a recompute of the
    corpus tokenization (asserted in tests/test_plan_shapes.py::
    test_incremental_dedup_scans_persisted_index). Build is one
    map-only corpus pass: tokenize → 60-bit gram hashes → 16-perm
    minhash → 4 band keys; the shingle table is checkpointed so the
    signature branch and the shingle write share one tokenize pass.
    """
    path = _index_path(sf_dir, exclude_mod, exclude_rem)
    bands_path = os.path.join(path, "bands")
    shingles_path = os.path.join(path, "shingles")
    if not os.path.exists(os.path.join(bands_path, "_SUCCESS")):
        corpus = load_table(spark, sf_dir, "documents").where(
            F.col("doc_id") % exclude_mod != exclude_rem
        )
        # the canonical stages (nd.shingle_frame / nd.minhash_band_frame)
        # — shared with the streaming append and every probe, so store
        # content cannot drift from its consumers
        sh = cut_lineage(nd.shingle_frame(corpus))
        sh.write.mode("overwrite").parquet(shingles_path)
        # at cluster scale: .repartition("key").sortWithinPartitions or a
        # bucketed table BY key, so shard probes are co-located scans
        nd.minhash_band_frame(sh).write.mode("overwrite").parquet(bands_path)
        # write-then-swap: stale sibling generations are retired ONLY
        # after the new generation's bands _SUCCESS marker lands, so a
        # crash mid-build leaves the previous generation usable and a
        # concurrent reader holding lazy frames on it is never pulled
        # out from under mid-scan by the builder of a fresher key
        parent = os.path.dirname(path)
        if os.path.exists(os.path.join(bands_path, "_SUCCESS")):
            import shutil

            for old in os.listdir(parent):
                if old != os.path.basename(path):
                    shutil.rmtree(os.path.join(parent, old), ignore_errors=True)
    return spark.read.parquet(bands_path), spark.read.parquet(shingles_path)


def index_summary_frame(bands: DataFrame, shingles: DataFrame) -> DataFrame:
    """Canonical content summary of a shingle/minhash index: per band
    the row count, distinct-key count, sid sum, and a bit_xor checksum
    over the 60-bit key hashes, plus a band=-1 row checksumming the
    full shingle table. Order-insensitive and engine-neutral (the
    shingle set is sorted before stringifying — array_distinct vs
    list_distinct element order differs), so a DuckDB oracle deriving
    the same summary from the raw corpus certifies the index content
    bit-for-bit. Shared by stream_index_ingest (base ∪ streamed delta)
    and dedup_index_compact (the compacted generation)."""
    from vector_search_ner_spark.functions.text import stable_long_hash

    # one scan, one aggregate: the key hash is staged alongside the
    # grouping columns so all four metrics come from a single groupBy
    band_sum = (
        bands.select(
            F.col("band").cast("int").alias("band"),
            "key",
            "sid",
            stable_long_hash(F.col("key")).alias("__kh"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("key").alias("n_keys"),
            F.sum("sid").cast("long").alias("sid_sum"),
            F.expr("bit_xor(__kh)").alias("content_xor"),
        )
    )
    sh_content = shingles.select(
        "sid",
        stable_long_hash(
            F.array_join(
                F.transform(F.array_sort(F.col("hs")), lambda h: h.cast("string")), ","
            )
        ).alias("__ch"),
    )
    sh_sum = sh_content.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("sid").alias("n_keys"),
        F.sum("sid").cast("long").alias("sid_sum"),
        F.expr("bit_xor(__ch)").alias("content_xor"),
    ).select(F.lit(-1).alias("band"), "n_rows", "n_keys", "sid_sum", "content_xor")
    return band_sum.unionByName(sh_sum).orderBy("band")
