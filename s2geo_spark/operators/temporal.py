"""Temporal joins Spark lacks natively: as-of join and banded interval join.

Neither operator exists in the reference (it is a spatial library), but both
are core to the training-data/feature-pipeline axis of this engine: as-of
joins attach the latest-known state (price, config, consent flag, model
version) to an event stream, and interval joins attribute points/events to
validity windows.  Public semantics followed:

* as-of join — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics:
  for each left row (key, t) pick the single right row (key, t') with the
  greatest t' <= t (direction='backward') or smallest t' >= t ('forward').
  Ties on t' are broken by a caller-supplied tie column (greatest wins for
  backward, smallest for forward) so results are deterministic.
* interval join — the "banded range join" rewrite used by every scalable
  SQL engine: quantize time into fixed-width buckets, turn the theta join
  into an equi-join on bucket, and keep the exact range predicate as a
  post-filter.

100-TB design notes
-------------------
``asof_join`` is NOT implemented as a range join (which explodes) nor as a
per-key ``applyInPandas`` (which buffers whole keys).  Both sides are
union-ed with a side tag and sorted once per key; the match is a running
``last(payload, ignorenulls)`` over an UNBOUNDED PRECEDING..CURRENT ROW
frame, which Spark executes as a streaming O(1)-memory accumulator inside
the sort — one shuffle, no buffering, no pair blow-up.  A key whose history
does not fit one task's sort spill is handled by Spark's external sort, not
by us.

``interval_point_join`` shuffles both sides once on the bucket id; each
point lands in exactly one bucket so no post-join dedup is needed.  Interval
x interval overlap assigns each candidate pair to the single bucket
``max(bucket(start_a), bucket(start_b))`` so overlapping pairs are emitted
exactly once without a ``distinct()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def _us(col: Column) -> Column:
    """Timestamp -> int64 microseconds (exact; avoids float epoch).
    Parquet timestamps load as TIMESTAMP_NTZ; the cast to TIMESTAMP is
    identity under the UTC session timezone the engine pins."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tie_col: str | None = None,
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the nearest preceding (or following) right
    row with the same key.  Returns all left columns plus each requested
    right column renamed ``<col><suffix>`` plus ``<right_ts><suffix>``.

    direction='backward': right ts' <= left ts, greatest ts' wins
    (tie: greatest tie_col).  direction='forward': right ts' >= left ts,
    smallest ts' wins (tie: smallest tie_col).  direction='nearest':
    whichever of the two is closer in time; an exact distance tie picks
    the backward match (pandas merge_asof semantics).  tolerance_s, if
    given, nulls out matches further than that many seconds away.

    'nearest' computes both directional running windows over the SAME
    keyed sort partitioning — one shuffle still; Spark inserts a second
    in-partition sort, not a second exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    tie = tie_col if tie_col is not None else right_cols[0]

    payload = F.struct(
        F.col(right_ts).alias("__match_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.col(tie).cast("long").alias("__tie"),
        F.lit(0).alias("__side"),
        payload.alias("__rp"),
    )
    # The left payload rides along in a struct so the match never needs a
    # join back (no synthetic row ids, no second shuffle).
    lpay = F.struct(*[F.col(c).alias(c) for c in left.columns])
    lhs = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__t"),
        F.lit(None).cast("long").alias("__tie"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rhs.schema["__rp"].dataType).alias("__rp"),
        lpay.alias("__lp"),
    )
    rhs = rhs.withColumn("__lp", F.lit(None).cast(lhs.schema["__lp"].dataType))
    both = rhs.unionByName(lhs)

    # right rows sort BEFORE left rows at equal ts (inclusive match); among
    # equal-ts right rows the winning tie sorts last.
    order_back = [F.asc("__t"), F.asc("__side"), F.asc("__tie")]
    # descending time: running "last" = smallest ts' >= t; at equal ts'
    # the smallest tie sorts last -> wins.
    order_fwd = [F.desc("__t"), F.asc("__side"), F.desc("__tie")]

    def running(order):
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__rp", ignorenulls=True).over(w)

    if direction == "backward":
        matched = both.withColumn("__m", running(order_back))
    elif direction == "forward":
        matched = both.withColumn("__m", running(order_fwd))
    else:  # nearest: both running passes share the one keyed exchange
        mb, mf = running(order_back), running(order_fwd)
        tcur = _us(F.col("__t"))
        both2 = both.withColumn("__mb", mb).withColumn("__mf", mf)
        db = F.abs(_us(F.col("__mb.__match_ts")) - tcur)
        df_ = F.abs(_us(F.col("__mf.__match_ts")) - tcur)
        pick_back = F.col("__mf").isNull() | (
            F.col("__mb").isNotNull() & (db <= df_)
        )
        matched = both2.withColumn(
            "__m", F.when(pick_back, F.col("__mb")).otherwise(F.col("__mf"))
        )
    matched = matched.where(F.col("__side") == 1)
    if tolerance_s is not None:
        lim = int(tolerance_s * _US)
        dist = F.abs(_us(F.col("__m.__match_ts")) - _us(F.col("__t")))
        matched = matched.withColumn(
            "__m", F.when(dist <= F.lit(lim), F.col("__m"))
        )

    out_cols = [F.col(f"__lp.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__match_ts").alias(f"{right_ts}{suffix}"))
    for c in right_cols:
        name = f"{c}{suffix}" if c in left.columns else c
        out_cols.append(F.col(f"__m.{c}").alias(name))
    return matched.select(*out_cols)


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    i_start: str,
    i_end: str,
    p_ts: str,
    bucket_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join points into half-open intervals [i_start, i_end) via fixed
    buckets.  ``bucket_s`` must be >= the longest interval for the explode
    factor to stay <= 2; each point maps to exactly one bucket so the
    output needs no dedup.  how='left' keeps empty intervals (point
    columns null)."""
    b_us = int(bucket_s) * _US
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(_us(F.col(i_start)) / b_us),
                F.floor((_us(F.col(i_end)) - 1) / b_us),
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(_us(F.col(p_ts)) / b_us))
    cond = (
        (iv["__b"] == pt["__b"])
        & (pt[p_ts] >= iv[i_start])
        & (pt[p_ts] < iv[i_end])
    )
    joined = iv.join(pt, cond, how)
    return joined.select(
        *[iv[c] for c in intervals.columns],
        *[pt[c] for c in points.columns],
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_s: int,
) -> DataFrame:
    """All (a, b) pairs whose half-open intervals overlap.  Both sides
    explode into their covered buckets; a pair is emitted only in the
    bucket ``max(bucket(a_start), bucket(b_start))`` so each overlapping
    pair appears exactly once with no distinct()."""
    b_us = int(bucket_s) * _US
    av = a.withColumn(
        "__sb", F.floor(_us(F.col(a_start)) / b_us)
    ).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.col("__sb"), F.floor((_us(F.col(a_end)) - 1) / b_us)
            )
        ),
    )
    bv = b.withColumn(
        "__sb", F.floor(_us(F.col(b_start)) / b_us)
    ).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.col("__sb"), F.floor((_us(F.col(b_end)) - 1) / b_us)
            )
        ),
    )
    cond = (
        (av["__b"] == bv["__b"])
        & (av["__b"] == F.greatest(av["__sb"], bv["__sb"]))
        & (av[a_start] < bv[b_end])
        & (bv[b_start] < av[a_end])
    )
    joined = av.join(bv, cond, "inner")
    return joined.select(
        *[av[c] for c in a.columns], *[bv[c] for c in b.columns]
    )
