"""Relational demo queries over the driver's TPC-H-ish tables.

The dedup engine's relational core (scan/filter/project/groupBy/join/
window/sort/limit) demonstrated on the standard star schema.  Sums are
computed in DECIMAL so results are bit-identical across engines
regardless of partial-aggregation order (double addition is not
associative; decimal is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: filter -> groupBy -> multi-agg -> sort."""
    dec = lambda c: F.col(c).cast("decimal(20,4)")  # noqa: E731
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(20,4)") - dec("l_discount")))
                .cast("decimal(20,4)")
            ).alias("sum_disc_price"),
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
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(20,4)") - dec("l_discount")))
                .cast("decimal(20,4)")
            ).alias("revenue")
        )
    )
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
            F.sum(F.col("value").cast("decimal(20,4)")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
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
