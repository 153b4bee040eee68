"""Physical-plan audit: turn an executed plan into countable facts.

SCALE.md documents a shuffle inventory per operator family ("one
partial-agg shuffle", "broadcast join, no exchange on the fact side").
This module makes those claims machine-checkable: ``audit_plan`` parses
the executedPlan string into counters that tests pin per query, so a
regression that adds a shuffle, drops a broadcast, reintroduces a
cartesian product, or pushes work into row-level Python FAILS a test
instead of surviving until someone reads a plan by hand.

String-level parsing of the plan dump is deliberate: it needs no
internal APIs, works across Spark versions, and the node names counted
here (Exchange, BroadcastExchange, CartesianProduct, BatchEvalPython,
WholeStageCodegen, ...) are the stable vocabulary of Spark's plan
printer.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanAudit:
    shuffle_exchanges: int      # data-proportional exchanges (hash/range/single)
    broadcast_exchanges: int    # bounded-size broadcasts
    sorts: int
    cartesian_products: int
    row_python_stages: int      # BatchEvalPython -- always a defect here
    arrow_python_stages: int    # ArrowEvalPython / mapInPandas / applyInPandas
    codegen_spans: int
    scans: int
    pushed_filter_scans: int    # scans that carry at least one pushed filter

    @property
    def python_free(self) -> bool:
        return self.row_python_stages == 0 and self.arrow_python_stages == 0


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame) -> PlanAudit:
    plan = plan_string(df)
    # After execution AdaptiveSparkPlan prints "== Final Plan ==" AND an
    # "== Initial Plan ==" section duplicating every node -- count only
    # the first section or every number doubles.
    plan = plan.split("== Initial Plan ==")[0]
    # A ReusedExchange line REPRINTS its target inline
    # ("ReusedExchange [...], Exchange hashpartitioning(...)"): the
    # physical exchange already counted at its definition site, so lines
    # carrying ReusedExchange are excluded from node counting.
    counted = "\n".join(
        ln for ln in plan.splitlines() if "ReusedExchange" not in ln
    )
    broadcast = len(re.findall(r"\bBroadcastExchange\b", counted))
    # a bare "Exchange" node moves data proportional to its input
    # (hashpartitioning, rangepartitioning, SinglePartition,
    # round-robin); \b keeps it from matching inside
    # BroadcastExchange/ReusedExchange
    shuffle = len(re.findall(r"\bExchange\b", counted))
    pushed = len(
        [
            m
            for m in re.findall(r"PushedFilters: \[([^\]]*)\]", counted)
            if m.strip()
        ]
    )
    return PlanAudit(
        shuffle_exchanges=shuffle,
        broadcast_exchanges=broadcast,
        sorts=len(re.findall(r"\bSort\b(?! merge)", counted)),
        cartesian_products=len(re.findall(r"\bCartesianProduct\b", counted)),
        row_python_stages=len(re.findall(r"\bBatchEvalPython\b", counted)),
        arrow_python_stages=len(
            re.findall(
                r"\bArrowEvalPython\b|\bMapInPandas\b|\bFlatMapGroupsInPandas\b",
                counted,
            )
        ),
        # codegen stages print as "*(n)" operator prefixes in the string
        # plan (one id per WholeStageCodegen subtree)
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", counted))),
        scans=len(re.findall(r"\bFileScan\b|\bScan parquet\b", counted)),
        pushed_filter_scans=pushed,
    )
