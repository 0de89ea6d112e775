"""Plan-shape assertions: the scale-critical physical-plan properties
(SURVEY.md §4) checked structurally, immune to this VM's timing noise."""

from __future__ import annotations

import pytest

from mnemophonix_spark.plans import inspect as pi


@pytest.fixture(scope="module")
def pipeline_dfs(spark, corpus_dir):
    from mnemophonix_spark import pipeline

    return pipeline.run_dedup(spark, corpus_dir)


def test_no_row_at_a_time_python_anywhere(pipeline_dfs):
    for name in ("signatures", "candidates", "scored", "verified", "clusters"):
        pi.assert_no_python_row_udf(pipeline_dfs[name])


def test_pair_joins_are_broadcast(spark, corpus_dir):
    """Rebuild the verified plan lazily (run_dedup persists, which hides
    join nodes behind InMemoryScan) and assert join strategies."""
    from mnemophonix_spark import pipeline
    from mnemophonix_spark.operators import lsh, verify as ver
    from mnemophonix_spark.operators.fingerprint import fingerprint, valid_signatures

    corpus = pipeline.load_corpus(spark, corpus_dir)
    valid = valid_signatures(fingerprint(corpus))
    cand = lsh.candidate_pairs(lsh.explode_bands(valid))
    verified = ver.verify_pairs(lsh.score_pairs(cand, valid), corpus)
    pi.assert_broadcast_only_joins(verified)
    facts = pi.plan_facts(verified)
    assert facts.broadcast_joins >= 4  # 2 score joins + 2 phash + 2 payload


def test_score_udf_not_cloned_by_pushdown(spark, corpus_dir):
    """score_pairs marks its pandas UDF asNondeterministic purely to
    stop Catalyst from pushing the min_score filter below the
    projection, which would clone the UDF into TWO ArrowEvalPython
    stages (score computed twice — measured regression in round 1).
    That is an optimizer-behavior dependency, so pin it: exactly one
    ArrowEvalPython node must appear in the scored plan.  If a Spark
    upgrade re-clones the UDF, this fails and the barrier needs a
    different mechanism (e.g. localCheckpoint)."""
    from mnemophonix_spark import pipeline
    from mnemophonix_spark.operators import lsh
    from mnemophonix_spark.operators.fingerprint import fingerprint, valid_signatures

    corpus = pipeline.load_corpus(spark, corpus_dir)
    valid = valid_signatures(fingerprint(corpus))
    import re

    scored = lsh.score_pairs(lsh.candidate_pairs(lsh.explode_bands(valid)), valid)
    scored.collect()  # AQE: the physical plan is final only after execution
    plan = scored._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # count DISTINCT sig_score evaluation expr-ids: reused exchanges
    # reprint the same node (same id), while pushdown-cloning creates a
    # second evaluation with a new id — exactly what must not happen
    ids = set(re.findall(r"sig_score\([^)]*\)#(\d+)", final))
    assert "ArrowEvalPython" in final
    assert len(ids) == 1, final


def test_scan_column_pruning(spark, corpus_dir):
    """The phash-gate scan must not read image bytes; the fingerprint
    scan must not read w/h."""
    from mnemophonix_spark import pipeline
    from mnemophonix_spark.operators.fingerprint import fingerprint

    # cached plans substitute InMemoryScan for the parquet scan and hide
    # ReadSchema; pruning must be asserted on the uncached plan
    spark.catalog.clearCache()
    corpus = pipeline.load_corpus(spark, corpus_dir)
    import re

    facts = pi.plan_facts(fingerprint(corpus))
    assert facts.read_schemas, "expected a parquet scan"
    for schema in facts.read_schemas:
        cols = set(re.findall(r"[<,](\w+):", schema))
        assert "w" not in cols and "h" not in cols, schema

    ph = corpus.select("image_id", "phash")
    facts_ph = pi.plan_facts(ph)
    assert all("bytes" not in s for s in facts_ph.read_schemas)


def test_promo_brand_broadcasts_dimension(spark):
    """Q14 shape: the part dimension must ride a broadcast join and
    the aggregation must combine map-side."""
    from mnemophonix_spark.operators import relational

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    df = relational.promo_revenue_by_brand(li, part)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "partial_sum" in final


def test_running_totals_single_exchange(spark):
    """The running-total window must cost exactly one hash exchange on
    the partition key (plus AQE reads) — no extra sort-shuffle pairs."""
    from mnemophonix_spark.operators import relational

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = relational.order_running_totals(li)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    import re

    # one exchange feeding the window sort; AQE shuffle reads excluded
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", final))
    assert n_exchanges == 1, final


def test_whole_stage_codegen_on_relational(spark):
    from mnemophonix_spark.operators import relational

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = relational.pricing_summary(li)
    df.collect()  # AQE: codegen nodes only appear in the final plan
    facts = pi.plan_facts(df)
    assert facts.whole_stage_codegen >= 1
    assert facts.batch_eval_python == 0
    # partial+final aggregation (map-side combine) and filter pushdown
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    assert "DataFilters: [isnotnull(l_shipdate" in plan


def test_bucketed_signature_join_is_shuffle_free(spark):
    """The 100 TB design claim 'pre-bucket/bucketBy the signature table
    on its join key for co-located joins' made concrete: joining two
    tables bucketed by image_id plans a SortMergeJoin with ZERO
    Exchange (no shuffle), while the identical join on unbucketed data
    shuffles both sides."""
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    for t in ("bkt_sigs", "bkt_caps", "plain_sigs", "plain_caps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    a = spark.range(0, 2000).selectExpr(
        "concat('img', id) AS image_id", "md5(string(id)) AS minhash"
    )
    b = spark.range(0, 2000).selectExpr(
        "concat('img', id) AS image_id", "concat('cap ', id) AS caption"
    )
    a.write.bucketBy(8, "image_id").sortBy("image_id").saveAsTable("bkt_sigs")
    b.write.bucketBy(8, "image_id").sortBy("image_id").saveAsTable("bkt_caps")
    a.write.saveAsTable("plain_sigs")
    b.write.saveAsTable("plain_caps")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def final_plan(df):
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.split("== Initial Plan ==")[0]

        bucketed = final_plan(
            spark.table("bkt_sigs").join(spark.table("bkt_caps"), "image_id")
        )
        plain = final_plan(
            spark.table("plain_sigs").join(spark.table("plain_caps"), "image_id")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bkt_sigs", "bkt_caps", "plain_sigs", "plain_caps"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    assert "SortMergeJoin" in bucketed
    assert "Exchange" not in bucketed, bucketed
    assert "Exchange" in plain  # the contrast: unbucketed must shuffle
