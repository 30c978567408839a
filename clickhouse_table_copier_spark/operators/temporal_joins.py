"""Temporal joins Spark lacks as built-ins: as-of join and range join.

These are the brief's canonical "custom operator" cases: implement as a
composition of existing DataFrame ops (option (a) of the custom-operator
ladder) rather than UDFs, so Catalyst still optimizes every piece.

- :func:`asof_join` — for each left row, the latest right row with
  ``right.time <= left.time`` per key (ClickHouse ASOF JOIN semantics).
  Implementation: tag + union both sides, one window sort per key with
  ``last(value, ignorenulls)`` carry-forward, keep left rows. ONE shuffle
  on the key (the window), versus a naive non-equi join's quadratic
  per-key blowup. At 100 TB this is the only formulation that survives:
  cost is sort-within-key, state is the carried row.
- :func:`range_join` — left rows matched to right interval rows with
  ``start <= t < end`` per key. Small interval side → broadcast non-equi
  join (each executor scans its left partition against the broadcast
  intervals); large interval side → bucketize both sides to turn it into
  an equi-join on (key, bucket) — provided here as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: latest right values at-or-before each left time.

    Left rows with no prior right row keep NULL values. Ties on exact
    time equality take the right row (right sorts before left at the same
    timestamp — ClickHouse ASOF `<=` semantics).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, time_col)
    ]
    l_tag = left.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c) for c in left.columns if c not in (key, time_col)],
    )
    r_tag = right.select(
        F.col(key),
        F.col(time_col),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, time_col)
        ],
    )
    unioned = l_tag.unionByName(r_tag)
    from pyspark.sql import Window

    # right rows sort before left rows at equal timestamps → `<=` semantics
    w = (
        Window.partitionBy(key)
        .orderBy(time_col, "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    out_cols = (
        [F.col(key), F.col(time_col)]
        + [F.col(c) for c in left.columns if c not in (key, time_col)]
        + [F.col(f"__asof_{c}").alias(c) for c in value_cols]
    )
    return carried.where(F.col("__is_left") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    key: str,
    time_col: str,
    start_col: str,
    end_col: str,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Inner range join: left rows × intervals with start <= t < end.

    ``broadcast_intervals=True`` is the dimension-sized path (calendar
    tables, config epochs): a broadcast non-equi join, no shuffle of the
    left side at all.
    """
    iv = F.broadcast(intervals) if broadcast_intervals else intervals
    cond = (
        (left[key] == iv[key])
        & (left[time_col] >= iv[start_col])
        & (left[time_col] < iv[end_col])
    )
    return left.join(iv, cond).drop(iv[key])


def range_join_bucketed(
    left: DataFrame,
    intervals: DataFrame,
    key: str,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """The SCALE path of :func:`range_join`, for interval sides too big
    to broadcast: each interval explodes into the time buckets it
    covers, the probe side computes its single bucket, and the interval
    containment becomes an EQUI-join on (key, bucket) plus a residual
    ``start <= t < end`` filter — hash-joinable, hence shuffle-
    partitionable across any cluster, where the non-equi form either
    broadcasts or degenerates to a nested loop.

    Fan-out is ⌈interval length / bucket_s⌉ rows per interval — pick
    ``bucket_s`` near the typical interval length so the blow-up is a
    small constant. Each (row, interval) pair meets in EXACTLY one
    bucket (the row's), so no post-join dedup is needed.
    """
    us = 1_000_000
    width = int(bucket_s) * us
    probe = left.withColumn(
        "__bkt",
        F.floor(F.unix_micros(F.col(time_col).cast("timestamp")) / width),
    )
    # degenerate intervals (end <= start) can never satisfy the residual
    # start <= t < end — drop them BEFORE the explode, because
    # F.sequence(stop < start) would otherwise generate a silent
    # DESCENDING bucket list (unbounded fan-out when end << start)
    intervals = intervals.where(F.col(end_col) > F.col(start_col))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    # end is exclusive: an interval ending exactly on a bucket boundary
    # must not claim that bucket
    e_us = F.unix_micros(F.col(end_col).cast("timestamp")) - 1
    iv = intervals.withColumn(
        "__bkt",
        F.explode(F.sequence(F.floor(s_us / width), F.floor(e_us / width))),
    )
    cond = (
        (probe[key] == iv[key])
        & (probe["__bkt"] == iv["__bkt"])
        & (probe[time_col] >= iv[start_col])
        & (probe[time_col] < iv[end_col])
    )
    return probe.join(iv, cond).drop(iv[key]).drop(iv["__bkt"]).drop("__bkt")


def _rec_type(right: DataFrame, time_col: str, value_cols: list[str]) -> str:
    """DDL type of the carried right struct. The ``__t`` field takes
    ``time_col``'s ACTUAL type — hardcoding timestamp_ntz made
    unionByName fail (or silently coerce) for TimestampType/date right
    sides even though the operator is otherwise type-generic."""
    t = right.schema[time_col].dataType.simpleString()
    fields = ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
    )
    return f"struct<__t:{t}" + ("," + fields if fields else "") + ">"


def _ord_cols(left: DataFrame, right: DataFrame, order_col: str | None, rec):
    """(left ``__ord``, right ``__ord``) tie-order expressions with one
    UNIFIED type. With an ``order_col`` on the right, the column keeps
    its NATIVE type — ordering by a string/uuid event id stays total and
    deterministic, where the former ``cast('long')`` silently nulled
    non-numeric ids and degraded tie order to partition-order-dependent
    (round-8 ADVICE). The left side contributes NULL of that same type
    (left tie order is irrelevant — every left row at a timestamp sees
    the same carried right record — but the union needs matching types);
    a same-named left column rides along natively for schema parity.
    Without an ``order_col`` on the right, the right falls back to
    ``xxhash64`` of the carried struct — still deterministic across
    runs, partitionings, and retries, though not meaningful to an
    external oracle (pass ``order_col`` when cross-engine comparison
    matters)."""
    if order_col is not None and order_col in right.columns:
        t = right.schema[order_col].dataType
        r_expr = F.col(order_col).alias("__ord")
        l_expr = (
            F.col(order_col) if order_col in left.columns else F.lit(None)
        ).cast(t).alias("__ord")
        return l_expr, r_expr
    r_expr = (
        F.xxhash64(rec) if rec is not None else F.lit(None).cast("long")
    ).alias("__ord")
    return F.lit(None).cast("long").alias("__ord"), r_expr


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str] | None = None,
    tolerance_s: int = 86400,
    order_col: str | None = None,
) -> DataFrame:
    """Backward as-of join with a STALENESS BOUND: latest right values
    at-or-before each left time, but only if that match is within
    ``tolerance_s`` seconds — older matches become NULL, exactly as a
    feature-store lookup must refuse stale features instead of silently
    attributing last month's state (pandas ``merge_asof(tolerance=...)``
    semantics, same union-window plan as :func:`asof_join` — one shuffle
    on the key, no join node at all).

    The matched right (timestamp, values) travel as ONE struct through
    ``last(..., ignorenulls)`` so the tolerance test and the carried
    values can never desynchronize. Ties at equal right timestamps are
    broken by ``order_col`` ascending (the LAST such row wins — pass the
    unique event id to make cross-engine tie order total); with
    ``order_col=None`` the tiebreaker falls back to ``xxhash64`` of the
    carried struct — still deterministic across runs and partitionings,
    though not meaningful to an external oracle (pass ``order_col`` when
    cross-engine comparison matters).
    """
    from pyspark.sql import Window

    value_cols = value_cols or [
        c for c in right.columns if c not in (key, time_col)
    ]
    rec = F.struct(
        F.col(time_col).alias("__t"), *[F.col(c).alias(c) for c in value_cols]
    )
    l_extra = [c for c in left.columns if c not in (key, time_col)]
    rec_type = _rec_type(right, time_col, value_cols)
    l_ord, r_ord = _ord_cols(left, right, order_col, rec)

    l_tag = left.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("__is_left"),
        l_ord,
        F.lit(None).cast(rec_type).alias("__r_rec"),
        *[F.col(c) for c in l_extra],
    )
    r_tag = right.select(
        F.col(key),
        F.col(time_col),
        F.lit(0).alias("__is_left"),
        r_ord,
        rec.alias("__r_rec"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_extra
        ],
    )
    unioned = l_tag.unionByName(r_tag)
    # among right rows at one timestamp the LAST (max __ord) wins,
    # matching the oracle's ts DESC, id DESC
    order = [F.col(time_col), F.col("__is_left"), F.col("__ord").asc_nulls_first()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__r_rec", ignorenulls=True).over(w).alias("__m")
    )
    fresh = (
        F.unix_timestamp(F.col(time_col).cast("timestamp"))
        - F.unix_timestamp(F.col("__m.__t").cast("timestamp"))
    ) <= tolerance_s
    out_cols = (
        [F.col(key), F.col(time_col)]
        + [F.col(c) for c in l_extra]
        + [
            F.when(fresh, F.col(f"__m.{c}")).alias(c)
            for c in value_cols
        ]
    )
    return carried.where(F.col("__is_left") == 1).select(*out_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str] | None = None,
    tolerance_s: int = 86400,
    order_col: str | None = None,
) -> DataFrame:
    """NEAREST-direction as-of join (pandas ``merge_asof(direction=
    'nearest', tolerance=...)``): each left row takes the right row with
    the smallest absolute time distance within ``tolerance_s``, looking
    both backward and forward. Tie rules, total and cross-engine
    deterministic: equal distance prefers the BACKWARD match (the earlier
    right row); equal right timestamps within a side prefer the max
    ``order_col`` (falling back to the max ``xxhash64`` of the carried
    struct when ``order_col=None`` — deterministic, but pass the unique
    id when the tie order must match an external oracle).

    Plan: the same union-window carry as :func:`asof_join_tolerance` run
    in BOTH directions — the backward pass orders (ts, right-first) and
    carries the latest prior right struct; the forward pass orders
    (ts DESC, right-first) and carries the earliest later right struct.
    Both windows hash-partition on the same key, so the second pass
    reuses the first's exchange — still ONE shuffle of each side's rows
    and zero join nodes, which is the only as-of form that survives when
    both sides are fact-sized.
    """
    from pyspark.sql import Window

    value_cols = value_cols or [
        c for c in right.columns if c not in (key, time_col)
    ]
    rec = F.struct(
        F.col(time_col).alias("__t"), *[F.col(c).alias(c) for c in value_cols]
    )
    l_extra = [c for c in left.columns if c not in (key, time_col)]
    rec_type = _rec_type(right, time_col, value_cols)
    l_ord, r_ord = _ord_cols(left, right, order_col, rec)
    l_tag = left.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("__is_left"),
        l_ord,
        F.lit(None).cast(rec_type).alias("__r_rec"),
        *[F.col(c) for c in l_extra],
    )
    r_tag = right.select(
        F.col(key),
        F.col(time_col),
        F.lit(0).alias("__is_left"),
        r_ord,
        rec.alias("__r_rec"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_extra
        ],
    )
    unioned = l_tag.unionByName(r_tag)
    frame = (Window.unboundedPreceding, Window.currentRow)
    # backward: latest right at-or-before; among equal right timestamps
    # the LAST (max __ord) is carried
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col), F.col("__is_left"), F.col("__ord").asc_nulls_first())
        .rowsBetween(*frame)
    )
    # forward: earliest right at-or-after; ts DESC puts later rows first,
    # right rows still sort before left at the same instant, and __ord
    # ascending again leaves the max-__ord right row as the carried last
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(
            F.col(time_col).desc(),
            F.col("__is_left"),
            F.col("__ord").asc_nulls_first(),
        )
        .rowsBetween(*frame)
    )
    carried = unioned.select(
        "*",
        F.last("__r_rec", ignorenulls=True).over(w_back).alias("__b"),
        F.last("__r_rec", ignorenulls=True).over(w_fwd).alias("__f"),
    )

    def _dist(m):
        # exact integer microseconds — nearest-direction comparisons must
        # not second-truncate, or two candidates 0.4 s apart tie wrongly
        return F.abs(
            F.unix_micros(F.col(time_col).cast("timestamp"))
            - F.unix_micros(m["__t"].cast("timestamp"))
        )

    tol_us = int(tolerance_s) * 1_000_000
    b_ok = F.col("__b").isNotNull() & (_dist(F.col("__b")) <= tol_us)
    f_ok = F.col("__f").isNotNull() & (_dist(F.col("__f")) <= tol_us)
    take_b = b_ok & (
        ~f_ok | (_dist(F.col("__b")) <= _dist(F.col("__f")))
    )
    chosen = F.when(take_b, F.col("__b")).when(f_ok, F.col("__f"))
    out_cols = (
        [F.col(key), F.col(time_col)]
        + [F.col(c) for c in l_extra]
        + [chosen[c].alias(c) for c in value_cols]
    )
    return carried.where(F.col("__is_left") == 1).select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """FORWARD as-of join, strict: for each left row, the EARLIEST right
    row with ``right.time > left.time`` per key (pandas ``merge_asof(
    direction='forward', allow_exact_matches=False)``) — the "next event
    after" primitive funnels and reaction-time analyses need.  Same
    union-window plan as :func:`asof_join`: one shuffle on the key, no
    join node, cost = sort-within-key at any scale.

    The frame is ``ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING``
    with right rows sorted BEFORE left rows at equal timestamps, so an
    equal-timestamp right row falls outside a left row's frame — that
    ordering trick is what makes the match strict.  Among right rows at
    the same (future) timestamp the FIRST by ``order_col`` ascending
    wins (mirror of the backward operators' last-wins rule; pass the
    unique event id to make cross-engine tie order total — the
    ``order_col=None`` fallback hashes the carried struct, deterministic
    but not oracle-meaningful).  The matched (timestamp, values) travel
    as one struct, so callers can bound the look-ahead window on
    ``<out>__t`` without a desynchronized second column.

    Returns the left columns plus ``value_cols`` (NULL when no later
    right row exists) plus ``__next_t`` = the matched right timestamp.
    """
    from pyspark.sql import Window

    value_cols = value_cols or [
        c for c in right.columns if c not in (key, time_col)
    ]
    rec = F.struct(
        F.col(time_col).alias("__t"), *[F.col(c).alias(c) for c in value_cols]
    )
    l_extra = [c for c in left.columns if c not in (key, time_col)]
    rec_type = _rec_type(right, time_col, value_cols)
    l_ord, r_ord = _ord_cols(left, right, order_col, rec)

    l_tag = left.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("__is_left"),
        l_ord,
        F.lit(None).cast(rec_type).alias("__r_rec"),
        *[F.col(c) for c in l_extra],
    )
    r_tag = right.select(
        F.col(key),
        F.col(time_col),
        F.lit(0).alias("__is_left"),
        r_ord,
        rec.alias("__r_rec"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_extra
        ],
    )
    unioned = l_tag.unionByName(r_tag)
    # right (0) before left (1) at equal timestamps: excluded from the
    # 1-FOLLOWING frame => strict `>`; among future rights the first by
    # (time, __ord) wins
    order = [F.col(time_col), F.col("__is_left"), F.col("__ord").asc_nulls_last()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*", F.first("__r_rec", ignorenulls=True).over(w).alias("__m")
    )
    out_cols = (
        [F.col(key), F.col(time_col)]
        + [F.col(c) for c in l_extra]
        + [F.col(f"__m.{c}").alias(c) for c in value_cols]
        + [F.col("__m.__t").alias("__next_t")]
    )
    return carried.where(F.col("__is_left") == 1).select(*out_cols)
