"""Full-surface timing pass (VERDICT r8 #7): wall-clock EVERY
registered query once at $SPARK_GRAFT_SF_DIR (default sf0.1), so a
plan regression in a NON-headline query shows up as a number each
round, not only as a plan-shape test failure. Single run per query
(this is a tripwire, not a benchmark — bench.py's best-of-N headline
remains the round-over-round perf record); stream_* queries are
included but dominated by harness overhead, as in the registry docs.

When a previous round's artifact is passed as argv[1], the de-drifted
>1.5x movers vs that round are AUTOMATICALLY RE-TIMED best-of-3 in a
second pass (VERDICT r10 #5 — the stream_neardup_flag hand
adjudication, mechanized): single-run timings on this shared VM swing
2-4x from CPU steal alone, so every flagged mover carries both its
single-run number and its best-of-3 minimum IN the artifact, and
perf_compare_surface.py adjudicates environmental-vs-real from the
retimed column without any hand re-timing.

Emits one JSON line: {"metric": "full_surface_runtime", "sf": ...,
"n_queries": N, "total_sec": T, "queries": {name: sec},
"drift_vs_prev": r, "retimed": {name: sec}} — append the summary row
to PERF.md via perf_compare_surface.py.

Run:  python perf_full_surface.py FULLSURFACE_r{N-1}.json > FULLSURFACE_r{N}.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_ner_spark import registry  # noqa: E402
from vector_search_ner_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("vsns-fullsurface")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry.collect()

    # the same session warmups as bench.py (JVM/codegen + Python
    # worker pool + the persisted vector store the pipelines serve
    # from), so first-query timings aren't session-cost artifacts
    from pyspark.sql import functions as F

    from vector_search_ner_spark.sources.vecstore import doc_vector_store

    next(iter(queries.values()))(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    _warm = F.pandas_udf(lambda v: v * 1.0, "double")
    spark.range(1000).repartition(32).select(
        _warm(F.col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()
    doc_vector_store(spark, sf_dir)

    def time_once(name) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            return round(time.perf_counter() - t0, 3)
        except Exception as e:  # record, keep sweeping
            print(f"ERR {name}: {e}", file=sys.stderr)
            return -1.0

    timings: dict[str, float] = {name: time_once(name) for name in queries}

    # auto re-time the de-drifted movers (same estimator as
    # perf_compare_surface.py: uniform drift = median new/old over
    # shared queries >= 0.5 s in the OLD pass; movers = >1.5x either
    # direction after dividing the drift out): best-of-3 per mover,
    # recorded ALONGSIDE the single-run number, never replacing it
    drift = None
    retimed: dict[str, float] = {}
    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        import statistics

        prev = json.load(open(sys.argv[1]))["queries"]
        basis = [
            n
            for n in timings
            if prev.get(n, -1.0) >= 0.5 and timings[n] > 0
        ]
        if basis:
            drift = round(
                statistics.median(timings[n] / prev[n] for n in basis), 4
            )
            movers = [
                n
                for n in basis
                if (timings[n] / prev[n]) / drift > 1.5
                or (timings[n] / prev[n]) / drift < 1 / 1.5
            ]
            for name in movers:
                print(f"RETIME {name} (single-run {timings[name]}s)", file=sys.stderr)
                retimed[name] = round(
                    min(timings[name], time_once(name), time_once(name)), 3
                )
    print(
        json.dumps(
            {
                "metric": "full_surface_runtime",
                "sf_dir": sf_dir,
                "n_queries": len(timings),
                "n_errors": sum(1 for t in timings.values() if t < 0),
                "total_sec": round(sum(t for t in timings.values() if t > 0), 2),
                "queries": timings,
                "drift_vs_prev": drift,
                "retimed": retimed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
