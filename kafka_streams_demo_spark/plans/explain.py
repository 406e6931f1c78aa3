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

    # Join nodes carry no plan_id in the executed-plan string. A cached
    # subtree is re-printed verbatim under EVERY InMemoryTableScan that
    # reads it, which would multiply join counts by the number of cache
    # readers (the 29-vs-9 distortion fixed for exchanges above) — but
    # deduping on line TEXT undercounts the other way: two genuinely
    # distinct join nodes over the same cached children print
    # byte-identical lines (cache re-prints reuse expression ids).
    # Dedupe POSITIONALLY instead (ADVICE r9): keep the first print of
    # each InMemoryRelation subtree, skip its re-prints wholesale (a
    # re-print is the same header line at any position; its subtree is
    # every following line with greater tree depth), then count every
    # remaining line — a cached subtree's operators count once (they
    # materialize once), genuinely distinct same-text nodes keep their
    # positions and count each.
    _lines = ep.splitlines()
    _strip = [re.sub(r"^[\s:+\-*]+", "", ln) for ln in _lines]
    _dep = [len(a) - len(b) for a, b in zip(_lines, _strip)]
    _kept: list[str] = []
    # Two readers of the SAME cache entry print different
    # InMemoryRelation header lines (DeduplicateRelations renames the
    # second reader's output attrs) over a byte-identical cached
    # subtree — so the dedup key is the SUBTREE text, not the header.
    # Distinct caches with the same shape can't collide: their subtree
    # exprIds differ (and identical analyzed plans share one cache
    # entry anyway).
    _seen_sub: set[str] = set()
    _i, _n = 0, len(_lines)
    while _i < _n:
        _st, _d = _strip[_i], _dep[_i]
        # an executed AdaptiveSparkPlan prints "== Final Plan ==" AND
        # "== Initial Plan ==" — the same nodes twice in ONE print;
        # keep only the final section
        if _st.startswith("== Initial Plan =="):
            # section content prints at depth EQUAL to the marker (no
            # +- prefix on the first node line) — skip >= and rely on
            # Initial always being the AdaptiveSparkPlan's LAST section
            _i += 1
            while _i < _n and _dep[_i] >= _d:
                _i += 1
            continue
        _kept.append(_lines[_i])
        if _st.startswith("InMemoryRelation"):
            _j = _i + 1
            while _j < _n and _dep[_j] > _d:
                _j += 1
            _key = "\n".join(_strip[_i + 1:_j])
            if _key in _seen_sub:
                _i = _j  # re-printed cached subtree: skip wholesale
                continue
            _seen_sub.add(_key)
        _i += 1

    def _node_count(name: str) -> int:
        return (
            sum(1 for ln in _kept if name in ln)
            if _kept
            else plan.count(name)
        )

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
