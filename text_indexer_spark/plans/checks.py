"""Physical-plan assertions — guard rails that the scale-critical plan
properties survive refactors.

These inspect ``df._jdf...executedPlan`` / ``explain`` text rather than
timing, so they're cheap enough for the test suite:

* filters/projections reach the parquet scan (PushedFilters, ReadSchema);
* small-side joins actually broadcast;
* no exchange appears where a plan is expected to be shuffle-free;
* whole-stage codegen covers the expression pipeline.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — they're the cheap kind)."""
    plan = formatted_plan(df)
    # formatted mode: "(4) Exchange" with partitioning on an Arguments
    # line; broadcast exchanges render as "(n) BroadcastExchange"
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if ANY parquet scan in the plan shows a pushed-down filter
    containing ``fragment`` (e.g. a column name) — multi-scan plans
    (join of two relations) check every scan, not just the first."""
    plan = formatted_plan(df)
    return any(
        fragment in m
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    )


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the parquet scan (column pruning).
    Depth-aware parse: nested types (``array<bigint>``) must not
    truncate the column list."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for line in plan.splitlines():
        line = line.strip()
        if not line.startswith("ReadSchema: struct<"):
            continue
        inner = line[len("ReadSchema: struct<"):line.rfind(">")]
        depth, token = 0, ""
        for ch in inner:
            if ch == "," and depth == 0:
                if token:
                    cols.add(token.split(":")[0].strip())
                token = ""
                continue
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            token += ch
        if token:
            cols.add(token.split(":")[0].strip())
    return cols


def has_partition_filter(df: DataFrame, fragment: str) -> bool:
    """True if a file scan carries a PARTITION filter containing
    ``fragment`` — i.e. directory-level pruning happens at planning
    time, before any IO."""
    plan = formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    return bool(m and fragment in m.group(1))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
