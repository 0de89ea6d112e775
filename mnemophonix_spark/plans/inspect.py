"""Physical-plan inspection helpers.

Small utilities used by tests and by the plan-audit harness
(tools/plan_audit.py) to assert scale-critical plan properties instead
of eyeballing `.explain` output:

- every pair-side join must be a broadcast hash join (no sort-merge of
  the corpus against a tiny pair list);
- scans must be column-pruned (image `bytes` only where pixels are
  actually needed);
- Python appears only in ArrowEvalPython / MapInArrow nodes (no
  row-at-a-time BatchEvalPython).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanFacts:
    broadcast_joins: int
    sort_merge_joins: int
    shuffled_hash_joins: int
    exchanges: int
    batch_eval_python: int      # row-at-a-time Python UDF (forbidden)
    arrow_python: int           # ArrowEvalPython / MapInArrow (allowed)
    read_schemas: list[str]
    whole_stage_codegen: int


def plan_facts(df: DataFrame) -> PlanFacts:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return PlanFacts(
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        shuffled_hash_joins=plan.count("ShuffledHashJoin"),
        exchanges=plan.count("Exchange"),
        batch_eval_python=plan.count("BatchEvalPython"),
        arrow_python=plan.count("ArrowEvalPython") + plan.count("MapInArrow"),
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", plan),
        # codegen spans render as "*(n) Node" markers in plan strings
        # (the literal WholeStageCodegen node name only appears in
        # explain("formatted")); count distinct span ids
        whole_stage_codegen=len(set(re.findall(r"\*\((\d+)\)", plan))),
    )


def assert_no_python_row_udf(df: DataFrame) -> None:
    facts = plan_facts(df)
    assert facts.batch_eval_python == 0, (
        "row-at-a-time Python UDF in plan (BatchEvalPython) — use a "
        "pandas UDF / mapInArrow instead"
    )


def assert_broadcast_only_joins(df: DataFrame) -> None:
    facts = plan_facts(df)
    assert facts.sort_merge_joins == 0 and facts.shuffled_hash_joins == 0, (
        f"non-broadcast join in plan: {facts}"
    )
