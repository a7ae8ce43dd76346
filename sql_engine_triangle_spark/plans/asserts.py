"""Physical-plan assertion helpers.

The reference lab checks EXPLAIN output as a first-class artifact
(EXPLAIN (ANALYZE, BUFFERS) / EXPLAIN PIPELINE per query —
q1 README.md:51,88,125,161). Our analog: assert that the executed
SparkPlan exhibits the behaviors Catalyst is expected to produce
(pushed filters, column pruning, partial+final aggregation,
broadcast joins, top-k without full sort, whole-stage codegen).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """The parquet scan carries a data filter on `column`
    (predicate pushdown — §4 row 1)."""
    plan = executed_plan(df)
    for m in re.finditer(r"(?:PushedFilters|DataFilters): \[(.*?)\]", plan):
        if column in m.group(1):
            return True
    return False


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read by the (first) parquet scan — column
    pruning check (§4 row 4). Parsed from `FileScan parquet [cols]`."""
    plan = executed_plan(df)
    m = re.search(r"FileScan parquet.*?\[(.*?)\]", plan)
    if not m:
        return []
    return [c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()]


def has_partial_final_agg(df: DataFrame) -> bool:
    """partial_* then final HashAggregate (§4 row 5; the lab's
    'Partial + Final HashAggregate', q3 README.md:88)."""
    plan = executed_plan(df)
    return "partial_" in plan and "HashAggregate" in plan


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT planned as TakeOrderedAndProject (true top-k,
    no full sort — §4 row 8)."""
    return "TakeOrderedAndProject" in executed_plan(df)


def _node_col(line: str) -> int:
    """Column where the node name starts in a plan-tree line — the
    tree depth proxy (children print strictly further right)."""
    for i, ch in enumerate(line):
        if ch not in " :+-|":
            return i
    return len(line)


def single_partition_subtrees(df: DataFrame) -> list[str]:
    """For every `Exchange SinglePartition` in the executed plan,
    return the subtree text BELOW it (its input). The bounded-window
    policy (CLAUDE.md: 'unless the frame is dimension-sized') is
    enforceable from these: a single-partition exchange is safe at
    100 TB only if its input is a bounded intermediate — i.e. the
    subtree contains an Aggregate (or a limit) between the exchange
    and any file scan."""
    lines = executed_plan(df).splitlines()
    out = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        col = _node_col(line)
        sub = []
        for nxt in lines[i + 1 :]:
            if _node_col(nxt) <= col:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


_SCAN_NODE = re.compile(r"FileScan|BatchScan")


def single_partition_scan_paths(df: DataFrame) -> list[str]:
    """For every `Exchange SinglePartition`, the ancestor CHAIN from
    the exchange down to each file scan in its input (one string per
    scan, nodes newline-joined). Strengthens the subtree check
    (ADVICE r7): a join below the exchange with one aggregated branch
    and one fact-sized branch has a bounding node SOMEWHERE in the
    subtree, but the fact branch's scan→exchange PATH crosses none —
    only a per-path walk catches that fact-scale funnel."""
    lines = executed_plan(df).splitlines()
    out: list[str] = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        col = _node_col(line)
        # stack of (depth_col, line) — the ancestor chain inside the
        # subtree; children print strictly further right.
        stack: list[tuple[int, str]] = []
        for nxt in lines[i + 1 :]:
            c = _node_col(nxt)
            if c <= col:
                break
            while stack and stack[-1][0] >= c:
                stack.pop()
            stack.append((c, nxt))
            if _SCAN_NODE.search(nxt):
                out.append("\n".join(s for _, s in stack))
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (vectorized/pipelined
    execution — §4 rows 9-10). Uses EXPLAIN CODEGEN because the AQE
    pre-execution plan string carries no codegen markers."""
    # AQE hides codegen stages until the plan is finalized — execute,
    # then count the `*(n)` codegen markers in the final plan.
    df.collect()
    plan = executed_plan(df)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
