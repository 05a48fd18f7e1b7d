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
parquet (path, mtime, size), the corpus split, and a VERSION constant,
so regenerated fixtures or a hashing change retire stale generations.
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
from vector_search_ner_spark.sources.catalog import load_table

ARTIFACT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "_artifacts",
)

# bump when the shingle/minhash definition or the store schema changes
NEARDUP_INDEX_VERSION = 1


def _index_path(sf_dir: str, exclude_mod: int, exclude_rem: int) -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:m{exclude_mod}r{exclude_rem}"
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
        parent = os.path.dirname(path)
        if os.path.isdir(parent):
            import shutil

            for old in os.listdir(parent):
                shutil.rmtree(os.path.join(parent, old), ignore_errors=True)
        corpus = load_table(spark, sf_dir, "documents").where(
            F.col("doc_id") % exclude_mod != exclude_rem
        )
        # the canonical stages (nd.shingle_frame / nd.minhash_band_frame)
        # — shared with the streaming append and every probe, so store
        # content cannot drift from its consumers
        sh = nd.shingle_frame(corpus).localCheckpoint(eager=True)
        sh.write.mode("overwrite").parquet(shingles_path)
        # at cluster scale: .repartition("key").sortWithinPartitions or a
        # bucketed table BY key, so shard probes are co-located scans
        nd.minhash_band_frame(sh).write.mode("overwrite").parquet(bands_path)
    return spark.read.parquet(bands_path), spark.read.parquet(shingles_path)
