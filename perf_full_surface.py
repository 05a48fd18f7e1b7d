"""Full-surface timing pass (VERDICT r8 #7): wall-clock EVERY
registered query once at $SPARK_GRAFT_SF_DIR (default sf0.1), so a
plan regression in a NON-headline query shows up as a number each
round, not only as a plan-shape test failure. Single run per query
(this is a tripwire, not a benchmark — bench.py's best-of-N headline
remains the round-over-round perf record); stream_* queries are
included but dominated by harness overhead, as in the registry docs.

Emits one JSON line: {"metric": "full_surface_runtime", "sf": ...,
"n_queries": N, "total_sec": T, "queries": {name: sec}} — append the
summary row (and any >1.5x mover vs the previous round's pass) to
PERF.md.

Run:  python perf_full_surface.py > FULLSURFACE_r{N}.json
Compare (movers vs a prior round, printed to stderr so the JSON line
stays clean):  python perf_full_surface.py FULLSURFACE_r{N-1}.json
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

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # record, keep sweeping
            timings[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "full_surface_runtime",
                "sf_dir": sf_dir,
                "n_queries": len(timings),
                "n_errors": sum(1 for t in timings.values() if t < 0),
                "total_sec": round(sum(t for t in timings.values() if t > 0), 2),
                "queries": timings,
            }
        )
    )
    # round-over-round movers: single-run timings swing 2-4x below ~1s
    # from CPU steal alone, so compare only queries that were >=1s in
    # either round and flag ratio >1.5x either direction
    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        prev = json.load(open(sys.argv[1]))["queries"]
        movers = []
        for name, t in timings.items():
            p = prev.get(name, -1.0)
            if p <= 0 or t <= 0 or max(p, t) < 1.0:
                continue
            ratio = t / p
            if ratio > 1.5 or ratio < 1 / 1.5:
                movers.append((ratio, name, p, t))
        print(f"MOVERS vs {sys.argv[1]} (>1.5x, either dir, >=1s):", file=sys.stderr)
        for ratio, name, p, t in sorted(movers, reverse=True):
            print(f"  {name}: {p:.2f}s -> {t:.2f}s ({ratio:.2f}x)", file=sys.stderr)
        if not movers:
            print("  none", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
