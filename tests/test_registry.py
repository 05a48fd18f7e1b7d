"""Registry-wide invariants on the `queries()` surface itself —
constraints the correctness DRIVER imposes on every registered query,
independent of what the query computes.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType


def test_no_complex_typed_output_columns(spark, sf_dir):
    """No registered query may emit an array/map/struct-typed OUTPUT
    column: the driver canonicalizes results through a pandas
    sort_values over every column, which cannot hash list cells — the
    r07 `sketch_distinct_quantiles` red was exactly this (`TypeError:
    unhashable type: 'list'` on its `qty_p50_p95` array column, before
    the driver could even count rows). Vectors/arrays are fine as
    INTERMEDIATE columns; registered outputs must project them to
    scalars (see multimodal_features' f0..f7 projection for the
    pattern). Runs over the whole registry so each new query inherits
    the guard the day it lands. Builds every frame at sf0.001 —
    side-effecting queries (sinks/streams/KMeans fits) execute, but at
    the smallest fixture this stays cheap, and their output schemas
    are exactly what the driver would sample."""
    from vector_search_ner_spark.registry import collect

    queries, _ = collect()
    offenders = []
    for name, fn in queries.items():
        schema = fn(spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, f"complex-typed output columns break the driver: {offenders}"
