"""Local replica of the driver's correctness gate: run a registered
Spark query and its DuckDB oracle on the same parquet fixtures, then
compare row count, schema arity, and (order-insensitively) every value.

Float columns are compared EXACTLY — queries are required to be
bit-deterministic across engines (decimal-exact aggregation, sequential
vector folds, explicit rounding), so any drift is a real bug.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from vector_search_ner_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
        else:
            df[c] = s.astype("object")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype == "float64":
            ok = np.array_equal(av, bv, equal_nan=True)
            if not ok:
                bad = np.where(~((av == bv) | (np.isnan(av) & np.isnan(bv))))[0][:5]
                diffs = [(i, av[i], bv[i], abs(av[i] - bv[i])) for i in bad]
                raise AssertionError(f"{name}: float col {c!r} differs (idx, spark, oracle, absdiff): {diffs}")
        elif a[c].dtype == "object":
            mism = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(av, bv))
                if not (x == y or (_isnan(x) and _isnan(y)))
            ][:5]
            assert not mism, f"{name}: col {c!r} differs: {mism}"
        else:
            ok = np.array_equal(av, bv)
            if not ok:
                bad = np.where(av != bv)[0][:5]
                diffs = [(i, av[i], bv[i]) for i in bad]
                raise AssertionError(f"{name}: col {c!r} differs: {diffs}")


def _isnan(x) -> bool:
    try:
        return x is None or (isinstance(x, float) and math.isnan(x))
    except TypeError:
        return False


def check_query(spark, name: str, sf_dir: str) -> None:
    """Run registered query `name` against its oracle and assert match."""
    from vector_search_ner_spark.registry import collect

    queries, oracles = collect()
    sdf = queries[name](spark, sf_dir).toPandas()
    assert name in oracles, f"{name} has no oracle (rows-only check)"
    odf = run_oracle(oracles[name], sf_dir)
    assert_frames_match(sdf, odf, name)
