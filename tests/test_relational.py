"""Relational-operator semantics on tiny hand-built frames: as-of join
edge cases (ties, no prior match), anti/semi membership, rollup grouping
ids.  The DuckDB twins in __spark_entry__ verify the same operators at
sf0.01 via tools/crosscheck.py; these tests pin the corner cases that a
randomly generated table may never exercise."""

from __future__ import annotations

import datetime

import pytest

from mnemophonix_spark.operators import relational
from mnemophonix_spark.plans import inspect as pi


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, minute, 0)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # user 1: click@0, click@5, purchase@5 (tie -> the @5 click),
        # purchase@7 (-> @5 click, latest wins over @0)
        (100, _ts(0), 1, "click", 1.0),
        (101, _ts(5), 1, "click", 1.0),
        (102, _ts(5), 1, "purchase", 9.0),
        (103, _ts(7), 1, "purchase", 9.0),
        # user 2: purchase@3 with no prior click; click@4 after it must
        # NOT match; purchase@6 matches click@4
        (200, _ts(3), 2, "purchase", 5.0),
        (201, _ts(4), 2, "click", 1.0),
        (202, _ts(6), 2, "purchase", 5.0),
        # user 3: clicks only -> no output rows
        (300, _ts(1), 3, "click", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_asof_join_semantics(tiny_events):
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_ts"])
        for r in relational.asof_join_events(tiny_events).collect()
    }
    assert set(out) == {102, 103, 200, 202}
    assert out[102] == (101, _ts(5))   # tie: right row at equal ts matches
    assert out[103] == (101, _ts(5))   # latest prior, not earliest
    assert out[200] == (None, None)    # no prior right row -> nulls kept
    assert out[202] == (201, _ts(4))   # later click ignored for earlier purchase


def test_asof_join_duplicate_right_ts_tiebreak(spark):
    """Two right events at the SAME (user_id, ts): the operator must
    deterministically carry max(event_id) — the semantics the oracle
    pins by pre-deduplicating its ASOF right side."""
    rows = [
        (500, _ts(2), 9, "click", 1.0),
        (501, _ts(2), 9, "click", 1.0),   # duplicate ts, higher id
        (499, _ts(2), 9, "click", 1.0),   # duplicate ts, lower id
        (502, _ts(4), 9, "purchase", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["event_id"]: r["asof_event_id"]
           for r in relational.asof_join_events(df).collect()}
    assert out == {502: 501}


def test_asof_join_single_shuffle(tiny_events):
    """The union+window implementation must cost exactly one hash
    exchange on the join key — that is its whole point at 100 TB."""
    df = relational.asof_join_events(tiny_events)
    facts = pi.plan_facts(df)
    assert facts.batch_eval_python == 0
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan  # no inequality/range join anywhere


def test_anti_and_semi_membership(spark):
    customer = spark.createDataFrame(
        [(1, "a", "M"), (2, "b", "M"), (3, "c", "M")],
        "c_custkey long, c_name string, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 2, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    no_urgent = relational.customers_without_orders(customer, orders)
    assert {r["c_custkey"] for r in no_urgent.collect()} == {2, 3}

    supplier = spark.createDataFrame(
        [(1, "s1", 0.0), (2, "s2", 0.0)], "s_suppkey long, s_name string, s_acctbal double"
    )
    lineitem = spark.createDataFrame(
        [(1, 1, "R"), (2, 1, "R"), (3, 2, "N")],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    semi = relational.suppliers_with_returns(supplier, lineitem)
    rows = semi.collect()
    # existence check: supplier 1 appears once despite two 'R' items
    assert [r["s_suppkey"] for r in rows] == [1]


def test_rollup_grouping_ids(spark):
    lineitem = spark.createDataFrame(
        [(1, 1.0, "R"), (1, 2.0, "N"), (2, 4.0, "R")],
        "l_orderkey long, l_quantity double, l_returnflag string",
    )
    orders = spark.createDataFrame(
        [(1, "1-URGENT"), (2, "5-LOW")], "o_orderkey long, o_orderpriority string"
    )
    out = relational.sales_rollup(lineitem, orders).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    # gid 0 = detail, 1 = per-priority subtotal, 3 = grand total
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[0]) == 3 and len(by_gid[1]) == 2 and len(by_gid[3]) == 1
    grand = by_gid[3][0]
    assert grand["o_orderpriority"] is None and grand["l_returnflag"] is None
    assert float(grand["sum_qty"]) == 7.0 and grand["n_items"] == 3


def test_regional_revenue_broadcasts_dims(spark):
    sf = "/root/testdata/sf0.001"
    rd = lambda n: spark.read.parquet(f"{sf}/{n}.parquet")  # noqa: E731
    df = relational.regional_revenue(
        rd("region"), rd("nation"), rd("customer"), rd("orders"), rd("lineitem")
    )
    df.collect()  # AQE: final plan
    facts = pi.plan_facts(df)
    # dim chain + dims-into-facts joins are all broadcast; lineitem is
    # only exchanged for the (tiny) final groupBy
    assert facts.broadcast_joins >= 3
    assert facts.batch_eval_python == 0
