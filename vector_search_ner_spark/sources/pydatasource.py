"""Custom connector via the Spark 4 Python DataSource API (SURVEY
§2.1's source/sink-extension surface, the PySpark-native analogue of
writing a DSv2 connector): a deterministic synthetic-documents
generator with REAL partition planning and filter pushdown, plus a
transactional JSONL sink with a two-phase commit manifest
(`JsonlManifestDataSource`).

Why a generator source: it exercises every part of the API contract —
schema declaration, `partitions()` fan-out (each InputPartition is a
contiguous id range, so the scan parallelizes like any splittable
file format), `pushFilters()` (id-range predicates narrow the
generated range BEFORE any row materializes — the Python-source
equivalent of parquet rowgroup pruning; unhandled predicates are
returned to Spark for post-scan evaluation), and per-partition
`read()` yielding plain tuples. Content derives from md5 arithmetic,
so a DuckDB oracle reproduces every row closed-form from
generate_series — the source is fully correctness-checkable.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

WORDS = ("alpha", "beta", "gamma", "delta", "epsilon")
_SCHEMA = "id long, bucket int, raw int, score double, word string"


def _hv(i: int) -> int:
    """The same 60-bit md5 derivation both engines use everywhere:
    CAST('0x' || substring(md5('syn:' || id), 1, 15) AS BIGINT)."""
    return int(hashlib.md5(f"syn:{i}".encode()).hexdigest()[:15], 16)


def row_for(i: int) -> tuple:
    hv = _hv(i)
    raw = hv % 10000
    return (i, int(hv % 16), int(raw), raw / 10000.0, WORDS[hv % len(WORDS)])


@dataclass
class RangePartition(InputPartition):
    start: int
    end: int


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, n: int, parts: int) -> None:
        self.lo = 0
        self.hi = n
        self.n_parts = max(1, parts)

    def pushFilters(self, filters: list[Filter]):
        """Fold id-range predicates into the generated range (fully
        handled — Spark will not re-evaluate them); every other filter
        is yielded back for post-scan evaluation."""
        for f in filters:
            if isinstance(f, GreaterThan) and f.attribute == ("id",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("id",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan) and f.attribute == ("id",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("id",):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("id",):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        parts = min(self.n_parts, total) or 1
        step, rem = divmod(total, parts)
        out, s = [], lo
        for p in range(parts):
            e = s + step + (1 if p < rem else 0)
            out.append(RangePartition(s, e))
            s = e
        return out

    def read(self, partition: RangePartition):
        for i in range(partition.start, partition.end):
            yield row_for(i)


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs").option("n", N)
    .option("parts", P).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(
            int(self.options.get("n", 1000)), int(self.options.get("parts", 8))
        )


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# the write half: a transactional JSONL sink with a commit manifest
# ---------------------------------------------------------------------------


MANIFEST_NAME = "_MANIFEST.json"


def read_manifest(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


class JsonlManifestWriter(DataSourceWriter):
    """Task/driver split of the DSv2 commit protocol, in Python: each
    task streams its rows to a TEMP file and returns (temp path, row
    count) as its commit message; only the DRIVER's commit() publishes.
    The MANIFEST is the committed-files source of truth — readers must
    list files from it, never glob the directory — and the commit
    order makes the manifest swap the atomic point: new parts land
    under fresh names that never collide with committed ones (part
    numbering continues after the existing maximum, so append cannot
    clobber), the manifest (new parts only on overwrite; old + new on
    append) is written to a temp and os.replace'd into place, and only
    THEN does overwrite delete the now-unreferenced old parts. A crash
    before the swap leaves the old manifest fully intact; a crash
    after it leaves at worst orphan files no manifest references.
    abort() removes the temps. At cluster scale the renames are
    object-store moves."""

    def __init__(self, path: str, overwrite: bool, batch_id: int | None = None) -> None:
        self.path = path
        self.overwrite = overwrite
        # streaming idempotence: when a foreachBatch caller passes its
        # batch_id (option("batch_id", ...)), the id is committed
        # ATOMICALLY with the manifest swap, so a replayed batch after
        # a checkpoint restart can be detected and skipped — this is
        # what upgrades the sink's at-least-once foreachBatch contract
        # to exactly-once (see stream_ingest_pysink)
        self.batch_id = batch_id

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import json
        import os
        import re

        # \d{5,}: numbering is zero-PADDED to 5 digits but not CAPPED
        # at 5 — past part-99999 the name grows a digit, and matching
        # only \d{5} here would recompute idx from the 5-digit names
        # and silently clobber a manifest-referenced 6-digit part
        existing = [
            name
            for name in os.listdir(self.path)
            if re.fullmatch(r"part-\d{5,}\.jsonl", name)
        ]
        idx = 1 + max(
            (int(name[5 : name.index(".")]) for name in existing), default=-1
        )
        old_parts = []
        if not self.overwrite and os.path.exists(
            os.path.join(self.path, MANIFEST_NAME)
        ):
            old_parts = read_manifest(self.path)["parts"]
        new_parts = []
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self.path, f"part-{idx:05d}.jsonl")
            os.replace(m.tmp_path, final)
            new_parts.append({"file": os.path.basename(final), "rows": m.n_rows})
            idx += 1
        parts = old_parts + new_parts
        manifest: dict = {"parts": parts, "total_rows": sum(p["rows"] for p in parts)}
        if self.batch_id is not None:
            manifest["last_batch_id"] = self.batch_id
        elif not self.overwrite and os.path.exists(
            os.path.join(self.path, MANIFEST_NAME)
        ):
            prev = read_manifest(self.path)
            if "last_batch_id" in prev:  # don't regress the watermark
                manifest["last_batch_id"] = prev["last_batch_id"]
        tmp_manifest = os.path.join(self.path, f"{MANIFEST_NAME}.tmp")
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_manifest, os.path.join(self.path, MANIFEST_NAME))
        if self.overwrite:
            referenced = {p["file"] for p in parts}
            for name in existing:
                if name not in referenced:
                    os.remove(os.path.join(self.path, name))
        # sweep temps left by failed/retried task attempts (abort()
        # only sees job-level failures): every committed message's temp
        # was just renamed away, so any _tmp-* still present is an
        # orphan. Safe under the sink's single-writer-per-directory
        # contract (concurrent jobs already race on part numbering).
        for name in os.listdir(self.path):
            if name.startswith("_tmp-") and name.endswith(".jsonl"):
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


@dataclass
class JsonlCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonlManifestDataSource(DataSource):
    """df.write.format("jsonl_manifest").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> JsonlManifestWriter:
        batch_id = self.options.get("batch_id")
        return JsonlManifestWriter(
            self.options["path"],
            overwrite,
            int(batch_id) if batch_id is not None else None,
        )


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlManifestDataSource)
