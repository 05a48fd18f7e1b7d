"""As-of (most-recent-prior) join — the temporal-enrichment operator
Spark lacks natively (pandas has merge_asof; DuckDB has ASOF JOIN,
which is the test oracle).

Implementation is the scale-correct UNION + WINDOW form, NOT a range
join: tag both sides, union them, and for each left row take the last
right payload at-or-before its timestamp via last(ignorenulls) over a
(keys, ts)-ordered window. Cost = ONE shuffle on the partition keys —
no pair explosion, no range-join quadratic blowup, skew bounded by the
hottest key like any window. The right side's payload columns ride
along as nullable fields; left rows surface the carried-forward values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the payload of the right row with the
    greatest right.ts <= left.ts within the same `on` key group (left
    join semantics: no prior right row -> NULL payloads).

    Both inputs must share `on` + `ts_col` names; `payload_cols` exist
    on the right. A right row at EXACTLY left.ts matches (<=), ordered
    before the left row via the side tag.
    """
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in on + [ts_col] else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (__side=0) sort before left rows at equal ts, so an
    # exact-ts right row is visible to the left row (ASOF <= semantics)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
    return carried.where(F.col("__side") == 1).drop("__side")
