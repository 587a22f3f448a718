"""Physical-plan audit helpers — the optimizations the 100-TB story
depends on, exposed as a library so jobs and tests share one probe.

A query that is correct at sf0.01 but loses its filter pushdown, its
broadcast dim join, or its whole-stage codegen span is a 100-TB
regression the row-level oracle cannot see; these helpers read the
EXECUTED plan (post-AQE re-planning) so CI and ad-hoc audits assert the
same properties tests/test_plans.py pins per query.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan as text (post-AQE final plan for the
    stages already materialized; the initial physical plan otherwise)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` payload in the plan's scans —
    empty means no predicate reached a data source (a full-scan smell
    for any query that claims to filter)."""
    out = []
    for line in executed_plan(df).splitlines():
        if "PushedFilters:" in line:
            payload = line.split("PushedFilters:", 1)[1].strip()
            # FileScan renders all metadata on ONE line — without cutting
            # at the list's MATCHING bracket (In(...) filters nest
            # brackets), the next ', Key:' entry (e.g. ', ReadSchema:
            # struct<...>') contaminates the payload
            if payload.startswith("["):
                depth = 0
                for i, ch in enumerate(payload):
                    depth += ch == "["
                    depth -= ch == "]"
                    if depth == 0:
                        payload = payload[: i + 1]
                        break
            else:
                payload = payload.split(", ", 1)[0].rstrip(",")
            out.append(payload)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Every ``ReadSchema`` payload — audit column pruning (a scan whose
    schema carries columns the query never touches reads them at 100 TB
    too)."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in executed_plan(df).splitlines()
        if "ReadSchema:" in line
    ]


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains an all-pairs join (CartesianProduct or
    BroadcastNestedLoopJoin) — the #1 does-not-survive-scale-up shape."""
    plan = executed_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def has_python_eval(df: DataFrame) -> bool:
    """True if any Python evaluation node (row-at-a-time or Arrow) is in
    the plan — SQL-surface queries must stay JVM-side; pipelines budget
    exactly ONE fused Arrow node."""
    plan = executed_plan(df)
    return any(
        marker in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF")
    )


def join_kinds(df: DataFrame) -> dict[str, int]:
    """Count of each join operator in the plan — audit that dims
    broadcast (BroadcastHashJoin) and facts sort-merge only when keys
    are genuinely large on both sides."""
    plan = executed_plan(df)
    kinds = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    return {k: plan.count(k) for k in kinds if plan.count(k)}


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (``Exchange hashpartitioning`` /
    ``rangepartitioning``) — each is a full network materialization at
    cluster scale; the audit number to watch when a query grows stages."""
    return sum(
        1
        for line in executed_plan(df).splitlines()
        if "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
    )


def single_partition_exchanges(df: DataFrame) -> int:
    """Number of ``SinglePartition`` exchanges — global windows/sorts
    that serialize the whole input through one task (the bigram-ntile
    class of scale bug; see dedup.txt_bigram_lm_ppl's offset mode)."""
    return executed_plan(df).count("Exchange SinglePartition")
