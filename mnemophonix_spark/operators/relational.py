"""Relational demo queries over the driver's TPC-H-ish tables.

The dedup engine's relational core (scan/filter/project/groupBy/join/
window/sort/limit) demonstrated on the standard star schema.  Sums are
computed in DECIMAL so results are bit-identical across engines
regardless of partial-aggregation order (double addition is not
associative; decimal is exact).

Output-type rule: every final decimal aggregate is emitted as
``round(CAST(x AS DOUBLE), 6)``.  Engines widen decimal sums
differently (Spark sum(decimal(20,4)) -> decimal(30,4), DuckDB ->
decimal(38,4)); the values agree but a representation-hashing gate
sees different physical types.  A decimal(,4) value converts to the
same nearest double in both engines (numerator < 2^53 at any SF we
materialize per group), so the rounded double is cross-engine
bit-identical while the internal accumulation stays exact decimal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _outd(c: Column) -> Column:
    """Final-output normalization for exact decimal aggregates."""
    return F.round(c.cast("double"), 6)


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: filter -> groupBy -> multi-agg -> sort."""
    dec = lambda c: F.col(c).cast("decimal(20,4)")  # noqa: E731
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _outd(F.sum(dec("l_quantity"))).alias("sum_qty"),
            _outd(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            _outd(F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(20,4)") - dec("l_discount")))
                .cast("decimal(20,4)")
            )).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def top_revenue_customers(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, limit: int = 10) -> DataFrame:
    """Two joins -> groupBy -> deterministic top-N."""
    dec = lambda c: F.col(c).cast("decimal(20,4)")  # noqa: E731
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            _outd(F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(20,4)") - dec("l_discount")))
                .cast("decimal(20,4)")
            )).alias("revenue")
        )
    )
    # order on the emitted (rounded-double) value so the top-N cut is
    # the same one the SQL twin makes; custkey breaks exact ties
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(limit)


def events_hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling-window rollup (batch form of the streaming aggregation):
    per (hour, event_type) counts + decimal value sums."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            _outd(F.sum(F.col("value").cast("decimal(20,4)"))).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def regional_revenue(region: DataFrame, nation: DataFrame,
                     customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame) -> DataFrame:
    """TPC-H Q5 shape: five-way star join -> groupBy -> sort.

    Scale note: region/nation/customer are dimension tables at any SF
    (customer is ~1/40 of lineitem rows and a few % of its bytes), so
    the dim chain is joined dim-to-dim first and broadcast into the
    fact side — no shuffle of the 100 TB table for any dim join; the
    final groupBy on (region, nation) exchanges only 25 partial rows
    per task.  The one unavoidable shuffle is lineitem⋈orders
    (fact-fact on orderkey); on a real warehouse both facts would be
    bucketed by orderkey at write time, which turns it into a
    zero-exchange sort-merge join.
    """
    dec = lambda c: F.col(c).cast("decimal(20,4)")  # noqa: E731
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            _outd(F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(20,4)") - dec("l_discount")))
                .cast("decimal(20,4)")
            )).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def promo_revenue_by_brand(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape per brand: conditional aggregation over a
    broadcast dimension join — promo share of discounted revenue.

    part is a dimension at any SF (1/30 of lineitem rows, few bytes):
    broadcast it so the fact scan streams once with no shuffle; the
    groupBy exchanges only 25 partial rows per task.  Output uses the
    round-6 double rule for the decimal sums and the ratio.
    """
    dec = lambda c: F.col(c).cast("decimal(20,4)")  # noqa: E731
    disc = (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(20,4)") - dec("l_discount"))
    ).cast("decimal(20,4)")
    joined = lineitem.join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey
    )
    promo_sum = F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(20,4)")
    ))
    total_sum = F.sum(disc)
    return joined.groupBy("p_brand").agg(
        _outd(promo_sum).alias("promo_revenue"),
        _outd(total_sum).alias("total_revenue"),
        F.round(
            (promo_sum.cast("double") / total_sum.cast("double")) * 100.0, 6
        ).alias("promo_pct"),
        F.count("*").alias("n_items"),
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame,
                             priority: str = "1-URGENT") -> DataFrame:
    """Left ANTI join (TPC-H Q22 shape): customers with no order of the
    given priority.

    The priority filter is pushed below the join, so Spark probes a
    reduced orders set; planned as a broadcast/shuffled hash anti-join —
    no row multiplication, safe at any skew.
    """
    urgent = orders.filter(F.col("o_orderpriority") == priority)
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def suppliers_with_returns(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Left SEMI join: suppliers that shipped at least one returned item.

    The semi join deduplicates the fact side inside the join operator
    (existence check), so no groupBy/distinct shuffle of lineitem is
    needed before probing.
    """
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        supplier.join(returned, supplier.s_suppkey == returned.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def sales_rollup(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """ROLLUP grouping sets over (priority, returnflag): one pass emits
    the detail rows, per-priority subtotals, and the grand total, with
    grouping_id() disambiguating NULL-as-subtotal from data NULLs.
    Spark expands grouping sets map-side before a single aggregation
    shuffle — no N-pass re-scan of the fact table.
    """
    dec = lambda c: F.col(c).cast("decimal(20,4)")  # noqa: E731
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .rollup("o_orderpriority", "l_returnflag")
        .agg(
            F.grouping_id().alias("gid"),
            _outd(F.sum(dec("l_quantity"))).alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


def user_engagement_sets(events: DataFrame) -> DataFrame:
    """Set operations demo: segment users by INTERSECT / EXCEPT over
    their event types.

    Output: (user_id, segment) where segment is one of
    click_and_purchase / click_only / purchase_only.  Spark plans
    intersect/subtract as left-semi/left-anti hash joins over the
    distinct sets — no row multiplication, same scale profile as the
    semi/anti operators.
    """
    clicks = events.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchases = (
        events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    return (
        clicks.intersect(purchases)
        .withColumn("segment", F.lit("click_and_purchase"))
        .unionByName(
            clicks.subtract(purchases).withColumn("segment", F.lit("click_only"))
        )
        .unionByName(
            purchases.subtract(clicks).withColumn("segment", F.lit("purchase_only"))
        )
    )


def asof_join_events(events: DataFrame,
                     left_type: str = "purchase",
                     right_type: str = "click") -> DataFrame:
    """AS-OF join: each `left_type` event matched to the user's most
    recent `right_type` event at-or-before it (reference has no such
    operator; standard time-series primitive the engine needs).

    Implemented with the union + last_value(ignore nulls) pattern
    rather than an inequality join: tag right rows 0 / left rows 1,
    union, then one window partitioned by user ordered by (ts, tag)
    carries the latest right event forward onto each left row.  Cost is
    a single hash shuffle on the join key + a per-key sort — linear at
    100 TB, whereas a range self-join is quadratic in events-per-user
    and an inequality join can't hash-partition at all.

    Tie semantics: among multiple right events at the same
    (user_id, ts), the window order on r_event_id makes last() carry
    the MAX event_id — deterministic here, whereas SQL ASOF JOIN
    leaves that choice unspecified, so the oracle pre-deduplicates its
    right side to max(event_id) per (user_id, ts) to pin the same
    semantics (no extra shuffle on this side: the dedup lives in the
    oracle only).
    """
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            "user_id", "ts",
            F.col("event_id").alias("l_event_id"),
            F.lit(1).alias("is_left"),
            F.lit(None).cast("long").alias("r_event_id"),
            F.lit(None).cast("timestamp").alias("r_ts"),
        )
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            "user_id", "ts",
            F.lit(None).cast("long").alias("l_event_id"),
            F.lit(0).alias("is_left"),
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    from pyspark.sql.window import Window

    # right rows sort before left rows at equal ts => ts_right <= ts_left
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left", "r_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        left.unionByName(right)
        .withColumn("asof_event_id", F.last("r_event_id", ignorenulls=True).over(w))
        .withColumn("asof_ts", F.last("r_ts", ignorenulls=True).over(w))
    )
    return (
        carried.filter(F.col("is_left") == 1)
        .select(
            F.col("l_event_id").alias("event_id"),
            "user_id",
            "ts",
            "asof_event_id",
            "asof_ts",
        )
    )


def order_running_totals(lineitem: DataFrame) -> DataFrame:
    """Running (cumulative) aggregate per order: for each line of an
    order in linenumber sequence, the cumulative quantity and revenue
    so far.  The window frame (unbounded preceding .. current row) is
    the canonical running-total shape — one hash shuffle on the
    partition key + a per-key sort, linear at 100 TB.  Output numeric
    rule: decimal accumulation, round-6 double emission.

    The sort key is the FULL value tuple, not just l_linenumber: this
    table's (orderkey, linenumber) is not unique, and a running total
    over a tied sort is engine-order-nondeterministic.  With all value
    columns in the key, rows that still tie are identical, so their
    mutual order cannot change any output.
    """
    dec = lambda c: F.col(c).cast("decimal(20,4)")  # noqa: E731
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        _outd(F.sum(dec("l_quantity")).over(w)).alias("running_qty"),
        _outd(F.sum(dec("l_extendedprice")).over(w)).alias("running_price"),
        F.count("*").over(w).alias("n_lines_so_far"),
    )


def parts_above_brand_avg(part: DataFrame) -> DataFrame:
    """Correlated-subquery shape: parts priced above their brand's
    average retail price.  Spark plans the correlated scalar subquery
    as an aggregate + broadcast join (the de-correlation rewrite) —
    exercised here via the equivalent explicit window formulation,
    which shares one shuffle for the average and the filter.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("p_brand")
    # avg as exact decimal sum / count, emitted round-6 double: a plain
    # double avg would accumulate in engine-specific order and can
    # round differently in the 6th decimal
    avg_price = (
        F.sum(F.col("p_retailprice").cast("decimal(20,4)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        part.withColumn("brand_avg", F.round(avg_price, 6))
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select(
            "p_partkey", "p_brand",
            F.round(F.col("p_retailprice").cast("double"), 6).alias("retail"),
            "brand_avg",
        )
    )


def user_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via window functions: a new session
    starts when a user's inter-event gap exceeds ``gap_minutes``.
    Output: (user_id, session_id, n_events, session_start).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = events.withColumn(
        "new_session",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
            > gap_minutes * 60,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_seq",
        F.sum(
            F.when(F.lag("ts").over(w).isNull(), 1).otherwise(F.col("new_session"))
        ).over(w),
    )
    return (
        gapped.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_id"),
            "n_events",
            "session_start",
        )
    )


def doc_length_percentiles(documents: DataFrame) -> DataFrame:
    """Exact percentile aggregation (linear interpolation) of document
    lengths per language bucket — Spark's `percentile` and DuckDB's
    `quantile_cont` share the interpolation rule, so the twin is exact
    modulo round(6).  Exact percentiles sort within each group; at
    100 TB switch to approx_percentile (t-digest sketch, one pass,
    mergeable) and loosen the oracle accordingly.
    """
    lengths = documents.select(
        (F.col("doc_id") % 4).alias("bucket"),
        F.length("text").alias("len"),
    )
    return lengths.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(len, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(len, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(len, 0.99)"), 6).alias("p99"),
        F.max("len").alias("max_len"),
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot: one row per user, one column per event type with counts.

    The explicit values list keeps the pivot single-pass (no extra
    distinct-scan job to discover columns) and the output schema stable
    — both required at scale and for a deterministic SQL twin (written
    as conditional aggregation, which is exactly Spark's physical plan
    for pivot).
    """
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select("user_id", *[F.col(t).alias(f"n_{t}") for t in types])
    )
