"""Physical-plan inspection utilities.

These exist because the engine's scale contract is expressed in plan
shapes, not prose: "describe is one scan", "filters reach the parquet
reader", "the verbose join broadcasts". Tests assert those properties
here so a regression that silently doubles scans or drops a pushed
filter fails CI, not a 100 TB run.

All functions parse ``df._jdf.queryExecution()`` text output — public
(`DataFrame.explain` renders the same strings) and stable enough across
Spark 3.x/4.x for the coarse counts asserted.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The formatted physical plan after (initial) AQE planning."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def scan_count(df: DataFrame) -> int:
    """Number of file-source scans in the physical plan. A fused
    describe/introduce must report 1 per distinct input (plus 1 for the
    exact-distinct bundle when split — see operators/describe.py).

    Counts unique node ids: the formatted output repeats each node in
    the tree header and the detail section."""
    return len(set(re.findall(r"\((\d+)\) Scan (?:parquet|csv|json|text)",
                              executed_plan(df))))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded — they
    move only small sides). Profiling aggregations over a single table
    must show exactly 1 (partial → final agg); extra exchanges mean an
    accidental repartition."""
    return len(set(re.findall(r"\((\d+)\) Exchange\b", executed_plan(df))))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """The filters the scan actually pushed to the parquet reader."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan column lists actually read from the source (column
    pruning evidence: a 2-column projection must not read 16)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c
        ]
        out.append(cols)
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans. More fused = fewer stages;
    an interpreted expression (CodegenFallback) splits spans."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", executed_plan(df))))
