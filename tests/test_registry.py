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


def test_plan_modules_import_in_any_entry_order():
    """The oracle-composition imports between queries_curation /
    queries_dedup / queries_streaming form a cycle at decoration time
    (curation's rep-agg → dedup's compact oracle → streaming's quota
    twin → back to curation). Each module must therefore bind every
    symbol a peer re-imports BEFORE its first @query decorator fires —
    otherwise whichever module is imported FIRST in a fresh process
    crashes with a partially-initialized-module ImportError, and the
    aborted exec leaves early registrations behind that poison every
    later collect() with duplicate-name errors (ADVICE r10). Pin all
    three entry points in subprocesses (a fresh interpreter each, so
    sys.modules can't hide the order dependence)."""
    import subprocess
    import sys

    for mod in (
        "vector_search_ner_spark.plans.queries_curation",
        "vector_search_ner_spark.plans.queries_streaming",
        "vector_search_ner_spark.plans.queries_dedup",
    ):
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                f"import {mod}\n"
                "from vector_search_ner_spark.registry import collect\n"
                "q, o = collect()\n"
                "assert len(q) >= 274, len(q)\n",
            ],
            capture_output=True,
            text=True,
        )
        assert proc.returncode == 0, f"{mod} first: {proc.stderr[-2000:]}"


def test_registry_reregistration_same_function_is_idempotent():
    """A module whose import crashed mid-exec is evicted from
    sys.modules but its already-decorated queries stay registered; the
    RETRY re-executes the module from the top and re-decorates the
    same functions. That retry must succeed (same module+qualname →
    overwrite), while a genuinely distinct function stealing the name
    must still raise."""
    import pytest

    from vector_search_ner_spark import registry

    name = "__test_rereg_probe__"

    def probe(spark, sf_dir):  # pragma: no cover - never called
        raise AssertionError

    try:
        registry.query(name, oracle="SELECT 1 AS x")(probe)
        registry.query(name, oracle="SELECT 2 AS x")(probe)  # retry: ok
        assert registry._ORACLES[name] == "SELECT 2 AS x"

        def thief(spark, sf_dir):  # pragma: no cover
            raise AssertionError

        with pytest.raises(ValueError, match="duplicate query name"):
            registry.query(name)(thief)
    finally:
        registry._QUERIES.pop(name, None)
        registry._ORACLES.pop(name, None)


def test_bench_changed_plan_rule_forces_window_entry():
    """The headline bench must FORCE every query whose implementing
    source or oracle differs from the committed manifest into its
    50-entry window (VERDICT r10 #6), displacing only stable rows and
    never exceeding the cap. Pure-python: exercises the computation
    bench.py runs before timing anything."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from vector_search_ner_spark.registry import collect

    qs, osql = collect()
    fps = bench._query_fingerprints(qs, osql)

    # no manifest -> the static list, no forcing
    names, forced = bench.compute_headline(qs, osql, None, {})
    assert forced == [] and names == [n for n in bench.HEADLINE if n in qs]

    # identical manifest -> no forcing
    names, forced = bench.compute_headline(qs, osql, dict(fps), {})
    assert forced == []

    # perturb three fingerprints (one stream_*, excluded by
    # convention): the two batch queries must be forced in and the
    # window must stay at the cap, dropping the FASTEST stable rows
    man = dict(fps)
    victims = ["dedup_ngram_jaccard", "postings_explode_outer"]
    for v in victims + ["stream_source_quota"]:
        man[v] = "stale"
    prev = {n: float(i) for i, n in enumerate(bench.HEADLINE)}
    names, forced = bench.compute_headline(qs, osql, man, prev)
    assert sorted(forced) == sorted(victims)
    assert all(v in names for v in victims)
    assert "stream_source_quota" not in names
    assert len(names) <= bench._CAP
    assert names.index(victims[0]) >= 0  # present, order irrelevant
    # displaced rows are exactly the lowest-prev-time stable ones
    displaced = set(n for n in bench.HEADLINE if n in qs) - set(names)
    assert displaced == set(bench.HEADLINE[: len(displaced)])

    # the committed manifest must actually exist and cover the registry
    # (the round-START --update-manifest ritual)
    assert os.path.exists(bench._MANIFEST)
    committed = json.load(open(bench._MANIFEST))
    assert set(committed) <= set(fps) | set(committed)
