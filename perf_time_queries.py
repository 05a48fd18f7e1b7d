"""Time individual registered queries exactly like bench.py does
(noop sink, clearCache between runs, warmup first, best-of-N) —
the optimization round's single-query measurement loop.

    python perf_time_queries.py [-nN] <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_ner_spark import registry  # noqa: E402
from vector_search_ner_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n_runs = 2
    if args and args[0].startswith("-n"):
        n_runs = int(args[0][2:])
        args = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries, _ = registry.collect()
    spark = get_spark("vsns-timer")
    # same warmups as bench.py
    queries[args[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda v: v * 1.0, "double")
    spark.range(1000).repartition(32).select(
        _warm(F.col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()
    from vector_search_ner_spark.sources.vecstore import doc_vector_store

    doc_vector_store(spark, sf_dir)
    for name in args:
        best, times = None, []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        print(f"TIMING {name}: best={best:.3f}s runs={times}")
    spark.stop()


if __name__ == "__main__":
    main()
