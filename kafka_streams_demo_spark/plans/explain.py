"""Physical-plan inspection — the ".explain and iterate" loop as code.

The reference's only plan surface is ``topology.describe()``
(WordCountProcessorExample.scala:89) plus one optimizer flag
(ConfigHelper.scala:24). Catalyst gives us a real optimizing planner, so the
engine's job shifts to *verifying* the plan properties that matter at 100 TB:

- filters and column pruning reach the parquet scan (PushedFilters/ReadSchema)
- dimension joins broadcast (BroadcastHashJoin), fact joins shuffle at most once
- expressions stay inside WholeStageCodegen (JVM, vectorized), not Python
- aggregations are partial (map-side combine) before the exchange

``audit(df)`` parses ``EXPLAIN FORMATTED`` into a structured summary;
tests/test_plans.py pins these properties for the headline queries so a
regression that silently de-optimizes a plan (a lost pushdown, a broadcast
that became a shuffle) fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """EXPLAIN output as a string (what ``df.explain(mode)`` prints)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@dataclass
class PlanAudit:
    """Structured summary of one physical plan."""

    plan: str
    exchanges: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    codegen_stages: int = 0
    python_evals: int = 0
    sorts: int = 0
    partial_aggs: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    @property
    def joins(self) -> int:
        return (
            self.broadcast_joins
            + self.sort_merge_joins
            + self.shuffled_hash_joins
            + self.nested_loop_joins
        )


def audit(df: DataFrame) -> PlanAudit:
    """Parse EXPLAIN FORMATTED into a PlanAudit.

    Counts come from the operator tree section; PushedFilters/ReadSchema come
    from the scan detail blocks.
    """
    plan = formatted_plan(df)
    simple = formatted_plan(df, "simple")
    a = PlanAudit(plan=plan)
    # Count PHYSICAL exchange nodes, not textual occurrences: a persisted
    # subtree is re-printed under every InMemoryTableScan that reads it,
    # so text counting multiplies its exchanges by the number of cache
    # readers even though they materialize once (minhash_lsh_incremental
    # read 29 where 9 shuffle nodes exist). plan_id is stable per node
    # across re-prints — dedupe on it; fall back to text counting when
    # the string carries no plan_ids.
    ep = df._jdf.queryExecution().executedPlan().toString()
    shuffle_ids = set(
        re.findall(r"(?<![A-Za-z])Exchange [^\n]*?\[plan_id=(\d+)\]", ep)
    )
    a.exchanges = len(shuffle_ids) or len(
        re.findall(r"^\s*[*+:\-\s]*Exchange", plan, re.M)
    ) or plan.count(" Exchange ")

    # Join nodes carry no plan_id in the executed-plan string, but a
    # cached subtree's re-prints are LINE-IDENTICAL (same expression
    # ids), while genuinely distinct nodes never are — dedupe on the
    # stripped line so persisted subtrees don't multiply join counts by
    # their cache readers (the same 29-vs-9 distortion fixed for
    # exchanges above).
    def _node_count(name: str) -> int:
        lines = {
            re.sub(r"^[\s:+\-*]+", "", ln)
            for ln in ep.splitlines()
            if name in ln
        }
        return len(lines) if lines else plan.count(name)

    a.broadcast_joins = _node_count("BroadcastHashJoin") + _node_count(
        "BroadcastNestedLoopJoin"
    )
    a.sort_merge_joins = _node_count("SortMergeJoin")
    a.shuffled_hash_joins = _node_count("ShuffledHashJoin")
    a.nested_loop_joins = _node_count("CartesianProduct")
    # Under AQE the pre-execution plan carries no WholeStageCodegen nodes
    # (they're fused per query stage at runtime), so re-plan a copy of the
    # query with AQE off purely to count fusable codegen spans.
    from pyspark.sql import functions as F

    spark = df.sparkSession
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        cg = formatted_plan(df.filter(F.lit(True)), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
    a.codegen_stages = int(m.group(1)) if m else len(set(re.findall(r"\*\((\d+)\)", simple)))
    # formatted plans list each node twice (tree + "(n) NodeName" detail):
    # count unique detail ids when present, else fall back to raw matches
    _py_nodes = "BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas(?:WithState)?|MapInPandas"
    _ids = re.findall(rf"^\(\d+\) (?:{_py_nodes})", plan, re.M)
    a.python_evals = len(_ids) or len(re.findall(_py_nodes, plan))
    a.sorts = len(re.findall(r"\bSort\b(?!MergeJoin)", plan))
    a.partial_aggs = len(re.findall(r"Functions \[\d+\]: \[partial_", plan)) + len(
        re.findall(r"\bpartial_(?:sum|count|max|min|avg|first)", simple)
    )
    a.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    a.partition_filters = [
        pf for pf in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if pf.strip()
    ]
    a.read_schemas = re.findall(r"ReadSchema: (\S+)", plan)
    return a


def assert_scan_pruned(a: PlanAudit, must_push: list[str], max_cols: int | None = None):
    """Assert at least one scan pushed each named filter column and (if
    given) that no scan reads more than ``max_cols`` columns."""
    pushed = " ".join(a.pushed_filters)
    for col in must_push:
        assert col in pushed, f"filter on {col} not pushed to scan:\n{a.pushed_filters}"
    if max_cols is not None:
        for rs in a.read_schemas:
            ncols = rs.count(":")
            assert ncols <= max_cols, f"scan reads {ncols} cols (> {max_cols}): {rs}"
