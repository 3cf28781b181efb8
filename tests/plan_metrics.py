"""Executed-plan SQLMetric extraction — turns the scale-design claims
("this agg partial-combines", "that shuffle carries ids only") into
measurable numbers. Works through Spark 4's AQE wrappers
(AdaptiveSparkPlan → *QueryStage → wrapped plan)."""

from __future__ import annotations

from typing import Any


def walk_metrics(node, depth: int = 0, out=None) -> list[tuple[int, str, dict]]:
    out = out if out is not None else []
    vals: dict[str, Any] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    name = node.nodeName()
    out.append((depth, name, vals))
    if name == "AdaptiveSparkPlan":
        walk_metrics(node.executedPlan(), depth + 1, out)
        return out
    if "QueryStage" in name:
        walk_metrics(node.plan(), depth + 1, out)
        return out
    ch = node.children()
    for i in range(ch.size()):
        walk_metrics(ch.apply(i), depth + 1, out)
    return out


def executed_metrics(df) -> list[tuple[int, str, dict]]:
    """Execute ``df`` (Arrow collect on its own QueryExecution, so the
    metric accumulators belong to THIS plan) and return the node
    metric tree."""
    df.toPandas()
    return walk_metrics(df._jdf.queryExecution().executedPlan())


def total_shuffle_bytes_written(df) -> int:
    """Sum of shuffleBytesWritten across every Exchange in the executed
    plan — the number that must stay bounded for a plan to survive a
    100× input scale-up without the network becoming the bottleneck."""
    return sum(
        v.get("shuffleBytesWritten", 0)
        for _, name, v in executed_metrics(df)
        if name == "Exchange"
    )
