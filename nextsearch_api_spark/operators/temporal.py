"""Temporal joins over event streams.

``asof_join`` — the classic time-series operator Spark's DataFrame API
lacks natively (Flink temporal joins / Pandas merge_asof / DuckDB ASOF
JOIN): for every left row, attach the LATEST right row whose timestamp is
<= the left timestamp, per key. The standard use in a training-data
pipeline is joining documents/events to the most recent prior snapshot
(crawl state, model version, feature table) without an expensive range
join.

Spark-first shape: instead of a theta-join (right.ts <= left.ts is a
non-equi condition Catalyst would plan as a broadcast nested loop or a
sort-merge with range filtering), the two sides are UNIONED and a single
per-key window with ``last(value, ignorenulls=true)`` carries each right
row's payload forward onto the left rows that follow it in time. ONE
shuffle keyed by the join key, no join node at all, linear scan per key.
Skewed keys degrade to a single partition's sorted scan (the same bound
as any per-key window); for pathological single-key streams, pre-split by
time range and stitch the last carried value across splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id",
              value_cols: "list[str] | None" = None,
              validate: bool = True) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``value_cols`` of the
    latest ``right`` row with ``right[on] <= left[on]`` and the same
    ``by`` key (NULLs where no prior right row exists).

    ``right`` must be unique on (by, on) — with duplicate right
    timestamps "the latest prior row" is ill-defined; pre-aggregate (as
    the gate entry does) or the carried values are pick-order dependent.
    ``validate=True`` (default) detects duplicates eagerly with an extra
    aggregation pass over the right side; pipelines that already guarantee
    uniqueness (e.g. the output of a groupBy) pass ``validate=False`` to
    skip that pass — at scale it doubles right-side reads (ADVICE/VERDICT
    r6). The join itself is identical either way.

    Equal timestamps on opposite sides match (<=, DuckDB ASOF semantics):
    the union sorts right rows before left rows within a timestamp.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (by, on)]
    clash = sorted(set(left.columns) & set(value_cols))
    if clash:
        # the final select emits both the left column and the carried right
        # column under the same name — ambiguous downstream (ADVICE r6)
        raise ValueError(
            f"asof_join: left already has column(s) {clash} that the right "
            "side would carry — rename or drop one side")
    if validate:
        dup = (right.groupBy(by, on).count()
               .where(F.col("count") > 1).limit(1).count())
        if dup:
            raise ValueError(
                f"asof_join: right side has duplicate ({by}, {on}) keys — "
                "pre-aggregate to one row per key/timestamp")
    left_cols = [c for c in left.columns if c not in (by,)]
    l = left.select(
        F.col(by), *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.lit(1).alias("_side"),
    )
    r = right.select(
        F.col(by), F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(0).alias("_side"),
    ).select(*l.columns)
    w = (Window.partitionBy(by).orderBy(F.col(on), F.col("_side"))
         .rowsBetween(Window.unboundedPreceding, 0))
    u = l.unionByName(r)
    for c in value_cols:
        u = u.withColumn(f"_r_{c}",
                         F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (
        u.where(F.col("_side") == 1)
        .select(F.col(by), *[F.col(c) for c in left_cols],
                *[F.col(f"_r_{c}").alias(c) for c in value_cols])
    )
