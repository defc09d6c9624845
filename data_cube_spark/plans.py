"""Physical-plan introspection helpers — the feedback loop for the
"would this survive 100×?" question.

Used by tests to assert that the plans we ship are the plans we want:
filters pushed to the parquet scan, dimensions broadcast (no fact shuffle
for star joins), bounded exchange counts, whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may merge some
    at runtime; this is the static upper bound)."""
    plan = explain_str(df, "simple")
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")

def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df, "simple")


def has_broadcast_hint(df: DataFrame) -> bool:
    """True iff the query carries an explicit broadcast join hint (checked
    on the *analyzed* logical plan, so the answer is independent of the
    autoBroadcastJoinThreshold-driven strategy the physical planner would
    pick anyway for small inputs)."""
    analyzed = df._jdf.queryExecution().analyzed().toString()  # type: ignore[attr-defined]
    return "ResolvedHint" in analyzed or "UnresolvedHint" in analyzed


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes."""
    plan = explain_str(df, "formatted")
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in pushed_filters(df)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    import re

    plan = explain_str(df, "formatted")
    cols: set[str] = set()
    for line in plan.splitlines():
        if "ReadSchema" in line:
            cols.update(re.findall(r"(\w+):", line.split("ReadSchema")[-1]))
    return sorted(cols)


def plan_report(df: DataFrame) -> dict:
    """One-call plan audit for a query you are about to run at scale:
    the numbers a reviewer checks before a 100 TB submit, as a dict.

    Keys: ``exchanges`` (static shuffle count, pre-AQE), ``scans``
    (parquet FileScan count), ``broadcast_joins`` / ``sort_merge_joins``
    (join strategy mix), ``nested_loop_joins`` (CartesianProduct +
    BroadcastNestedLoopJoin — should be 0 or a deliberate 1-row scalar),
    ``pushed_filters`` (True iff any scan received pushdown),
    ``partition_filters`` (True iff any scan prunes partitions, static
    or dynamic), ``dynamic_pruning`` (DPP subquery present).
    """
    plan = explain_str(df, "simple")
    return {
        "exchanges": count_exchanges(df),
        "scans": plan.count("FileScan"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": (plan.count("BroadcastNestedLoopJoin")
                              + plan.count("CartesianProduct")),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" != _first_pushed(plan),
        "partition_filters": "PartitionFilters: [" in plan
        and any(seg.split("]")[0].strip()
                for seg in plan.split("PartitionFilters: [")[1:]),
        "dynamic_pruning": "dynamicpruning" in plan.lower(),
    }


def _first_pushed(plan: str) -> str:
    for seg in plan.split("PushedFilters: [")[1:]:
        inner = seg.split("]")[0].strip()
        if inner:
            return f"PushedFilters: [{inner}]"
    return "PushedFilters: []"
