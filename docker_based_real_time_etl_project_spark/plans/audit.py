"""Extractors over the formatted physical plan string.

Parsing the explain text (rather than walking the JVM plan tree via
py4j) keeps these version-tolerant: the formatted output's
`PushedFilters:` / `ReadSchema:` / node-name lines are the stable
public face of the planner.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def formatted_plan(df: DataFrame) -> str:
    jq = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jq.explainString(mode)


@dataclass
class ScanInfo:
    pushed_filters: list[str]
    read_columns: list[str]


def scan_infos(df: DataFrame) -> list[ScanInfo]:
    """One entry per parquet scan: which filters reached the reader and
    which columns it physically reads."""
    plan = formatted_plan(df)
    out: list[ScanInfo] = []
    filters: list[str] | None = None
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip()
            filters = [f.strip() for f in body.strip("[]").split(",") if f.strip()]
        elif line.startswith("ReadSchema:"):
            body = line.split(":", 1)[1].strip()
            cols = re.findall(r"(\w+):", body[len("struct<"):])
            out.append(ScanInfo(filters or [], cols))
            filters = None
    return out


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Physical join node counts, e.g. {'BroadcastHashJoin': 4}."""
    plan = formatted_plan(df)
    # count "(N) NodeName" detail entries only -- the formatted output
    # also names every node in the tree sketch, which would double-count
    return {
        n: c
        for n in _JOIN_NODES
        if (c := len(re.findall(rf"\(\d+\) {n}\b", plan))) > 0
    }


def count_exchanges(df: DataFrame, include_repartition: bool = False) -> int:
    """Semantic shuffle exchanges in the plan (broadcast exchanges
    excluded): the number every scale review starts from.

    Exchanges whose origin is an explicit repartition
    (REPARTITION_BY_NUM/_COL -- e.g. the loader's degenerate-input
    conditioning) are input plumbing, not query shuffles, and are
    excluded unless `include_repartition`."""
    plan = formatted_plan(df)
    # formatted mode: "(N) Exchange" detail header, Arguments a couple
    # of lines below carry the partitioning + shuffle origin
    count = 0
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    for b in blocks:
        if re.match(r"\(\d+\) Exchange\b", b):
            if include_repartition or "REPARTITION_BY" not in b:
                count += 1
    return count
