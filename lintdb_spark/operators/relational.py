"""Relational / streaming-analytics operators over the TPC-H-ish tables.

The reference has no relational layer at all (SURVEY.md §2.I) — in the
Spark rebuild these come from Spark SQL; they're included as
first-class queries because (a) they exercise the engine's scan /
join / aggregate paths at bench scale and (b) a training-data pipeline
needs them (cohorting, windowing, join-enrichment).

Scale notes per query are in the docstrings; the common themes:
dimension tables broadcast, facts shuffle once on the group key,
aggregates are partial (map-side combine) by construction, and
top-k is orderBy().limit() = TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lintdb_spark import params


def _money(col: str):
    """Money/ratio columns as exact DECIMAL(12,2) — the synthetic data
    is 2-decimal by construction (like TPC-H's DECIMAL(15,2)). Exact
    decimal accumulation makes every SUM independent of partition
    layout and row order; summing the raw doubles instead leaves the
    result one ulp from a round-half boundary on knife-edge totals
    (observed: q_pricing_summary's sum_disc_price flipped a cent when
    the cached partition count changed)."""
    return F.col(col).cast("decimal(12,2)")


def _one():
    # built lazily: F.lit at module import time requires an active
    # SparkContext under classic PySpark
    return F.lit(1).cast("decimal(12,2)")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, 4 groups. One shuffle of
    8 partial rows per task — pure map-side combine at any scale.
    Decimal-exact sums (see _money); averages divide the exact decimal
    sum as a double by the count, so both engines do ONE identical
    float division instead of order-sensitive accumulation."""
    disc_price = _money("l_extendedprice") * (_one() - _money("l_discount"))
    charge = disc_price * (_one() + _money("l_tax"))
    cnt = F.count("*")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit(cutoff)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_money("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_money("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(
                F.sum(_money("l_quantity")).cast("double") / cnt, params.ROUND
            ).alias("avg_qty"),
            F.round(
                F.sum(_money("l_extendedprice")).cast("double") / cnt, params.ROUND
            ).alias("avg_price"),
            F.round(
                F.sum(_money("l_discount")).cast("double") / cnt, params.ROUND
            ).alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


def top_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1997-06-30",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: customer (dim, broadcast) |x| orders |x| lineitem,
    revenue per order, top-k. lineitem-orders co-shuffle on orderkey;
    at 100 TB bucket both on orderkey to kill the shuffle entirely."""
    d = F.to_timestamp(F.lit(date))
    rev = _money("l_extendedprice") * (_one() - _money("l_discount"))
    return (
        F.broadcast(customer.filter(F.col("c_mktsegment") == segment))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < d)
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > d)
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def revenue_by_nation(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q5 shape (customer-nation variant): snowflake of broadcast
    dims onto the lineitem fact; single shuffle on the 25-value group
    key."""
    rev = _money("l_extendedprice") * (_one() - _money("l_discount"))
    return (
        F.broadcast(
            region.filter(F.col("r_name") == region_name)
            .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        )
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit(date_from)))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit(date_to)))
        )
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling-window aggregate (batch form of the streaming windowed
    count; the Structured Streaming twin lives in
    lintdb_spark.streaming). Output key is epoch-seconds so hashes are
    engine-independent."""
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
    )


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via lag window: a session break is a
    > gap_minutes silence per user. (user_id, n_events, n_sessions).
    Single shuffle on user_id; skew-safe under AQE."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(F.col("us").asc(), F.col("event_id").asc())
    marked = (
        events.select("user_id", "event_id", F.unix_micros(F.col("ts")).alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > gap_us), 1
            ).otherwise(0),
        )
    )
    return marked.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("is_new").cast("bigint").alias("n_sessions"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """AS-OF JOIN — for each left row, the LATEST right row with
    right.ts <= left.ts in the same ``on`` partition (left-join
    semantics: unmatched left rows keep NULLs). The classic
    point-in-time lookup (trade->quote, click->purchase attribution)
    that Spark has no built-in operator for.

    Tie rule (deterministic, mirrored by the oracle): at equal ts the
    right row still matches (inclusive), and among right rows sharing
    (key, ts) the one greatest in ``right_cols`` order wins.

    Scale shape: implemented as union + window carry-forward, NOT a
    range join — both streams are tagged, unioned, and sorted once per
    key by (ts, tag, payload); a last(ignorenulls) carries the most
    recent right payload into each left row. ONE shuffle on the key,
    state bounded by one carried struct per row, no per-key row
    explosion (a naive l.ts >= r.ts range join is quadratic per key).
    Skewed keys split under AQE; at 100 TB this is the plan every
    point-in-time feature store runs."""
    payload_t = F.struct(*[F.col(c) for c in right_cols])
    # a NULL-ts right row can never satisfy right.ts <= left.ts (SQL
    # comparison semantics; DuckDB's native ASOF never matches it
    # either) — but NULLs sort FIRST ascending, so an unfiltered one
    # would be carried into every left row that precedes all real
    # right rows, silently matching the unmatched
    rt = right.filter(F.col(ts).isNotNull()).select(
        F.col(on),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_is_l"),
        payload_t.alias("_p"),
    )
    left_cols = [c for c in left.columns if c not in (on, ts)]
    lt = left.select(
        F.col(on),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_is_l"),
        F.lit(None).cast(rt.schema["_p"].dataType).alias("_p"),
        *left_cols,
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort BEFORE left at equal ts (inclusive match); among
    # right rows sharing (key, ts) the struct sort puts the greatest
    # payload LAST, so it is the one carried
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_l").asc(), F.col("_p").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_p", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_l") == 1).drop("_is_l", "_p")
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_match.{c}"))
    return out.drop("_match").withColumnRenamed("_ts", ts)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    lower_us: int,
    upper_us: int,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Bounded RANGE (interval) JOIN — all right rows with
    left.ts + lower <= right.ts < left.ts + upper in the same ``on``
    partition (bounds in MICROSECONDS; half-open upper).

    Scale shape: Spark would otherwise plan key-equi + range-predicate
    as a per-key sort-merge with a post-filter — per-key quadratic when
    keys are hot. Here both sides are BUCKETIZED on the interval width
    (right rows duplicated into the neighbor bucket), so the join is a
    plain equi-join on (key, bucket) whose fan-out is bounded by rows
    per bucket — the standard bounded-range trick every interval-join
    engine (Flink, KDB wj, TimescaleDB) uses. Exact bounds re-checked
    after the candidate join; duplicate bucket matches dedupped by
    construction (a pair matches in exactly one of the two emitted
    buckets once the exact filter runs — the right row lands in the
    left row's bucket or its successor).
    """
    width = upper_us - lower_us
    if width <= 0:
        raise ValueError("upper_us must be > lower_us")
    def _us(df):
        # TIMESTAMP_NTZ is what parquet-without-timezone resolves to
        # under Spark 4.x (the same normalization streaming's
        # _ensure_event_time does); matching only "timestamp" would
        # send NTZ columns down the integer path and fail the bigint
        # arithmetic below. Session TZ is UTC, so the cast is
        # value-preserving — and both sides of the join shift alike.
        dt = dict(df.dtypes)[ts]
        if dt == "timestamp":
            return F.unix_micros(F.col(ts))
        if dt == "timestamp_ntz":
            return F.unix_micros(F.col(ts).cast("timestamp"))
        return F.col(ts)

    l_us = _us(left)
    r_us = _us(right)
    lt = left.withColumn("_lus", l_us).withColumn(
        "_b", F.floor((F.col("_lus") + lower_us) / width)
    )
    payload = F.struct(*[F.col(c) for c in right_cols])
    rt = (
        right.withColumn("_rus", r_us)
        .select(
            F.col(on),
            "_rus",
            payload.alias("_p"),
            # a right row can satisfy lefts in its own interval-bucket
            # and the previous one -> emit both candidate buckets
            F.explode(
                F.array(
                    F.floor(F.col("_rus") / width),
                    F.floor(F.col("_rus") / width) - 1,
                )
            ).alias("_b"),
        )
    )
    joined = lt.join(rt, [on, "_b"]).filter(
        (F.col("_rus") >= F.col("_lus") + lower_us)
        & (F.col("_rus") < F.col("_lus") + upper_us)
    )
    out = joined
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_p.{c}"))
    return out.drop("_p", "_b", "_lus", "_rus")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table — the storage
    layout that removes the shuffle from every future equi-join or
    aggregation on ``key``. Spark records bucket spec in the catalog;
    scans of two tables bucketed on their join keys with the same
    bucket count satisfy the join's distribution requirement directly
    (SortMergeJoin with NO Exchange — see
    test_bucketed_join_is_shuffle_free).

    At 100 TB this is the difference between re-shuffling the fact
    table on every orderkey join and never shuffling it again: the
    one-time bucketed write is the amortized shuffle. Bucket count
    should target HDFS-block-sized files per bucket (thousands at
    warehouse scale; tests use small counts)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured payload extraction + per-type stats: parse the
    JSON `props` column JVM-side (`get_json_object`, Jackson JsonPath
    — no UDF, no Python) and aggregate per event_type. The standard
    clickstream-ETL shape: at 100 TB this is scan-speed JSON path
    extraction feeding a |event_types|-row aggregate (map-side
    partials; nothing but the tiny result shuffles). Returns
    (event_type, n_events, n_with_k, sum_k, min_k, max_k)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
