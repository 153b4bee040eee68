"""Shuffle-inventory regression net (plans/audit.py): SCALE.md's
per-operator shuffle claims, machine-checked. Budgets are ceilings on
DATA-PROPORTIONAL exchanges — a regression that adds a shuffle, drops a
broadcast to a shuffle join, reintroduces a cartesian, or pushes work
into row-level Python fails here instead of surviving until someone
reads a plan by hand. (AQE may REMOVE exchanges at runtime; it never
adds them, so ceilings are stable.)"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from sparkbigdatatextanalysis_spark.plans import audit_plan

SF = "/root/testdata/sf0.001"

# query -> (max shuffle exchanges, min broadcast exchanges)
# Shuffle budgets include the local-mode scan fan-out repartition
# (\_scan wide=True), which a real cluster's natural splits make moot.
BUDGETS = {
    # map-only projections: NO data-proportional exchange at all
    "docs_split_sample": (0, 0),
    "text_normalize": (0, 0),
    "docs_pii_scrub": (0, 0),
    # one-shuffle aggregations (plus fan-out where text-bound)
    "dedup_exact": (1, 0),
    "pricing_rollup": (1, 0),
    "events_latest_per_user": (1, 0),
    "text_quality": (1, 0),
    "minhash_signatures": (2, 0),
    # groupBy stats + broadcast join back (NOT a global window)
    "events_value_zscore": (1, 1),
    "winsorize_values": (1, 1),
    # shared-scan count + broadcast totals (ReuseExchange eligible)
    "heavy_hitter_users": (2, 1),
    # copy-on-write MERGE: the target is scanned, never shuffled —
    # every broadcast is of the (key-only) changeset
    "merge_upsert_events": (2, 3),
    # two-phase grouped top-k: agg + local-rank + global-rank exchanges,
    # dim rides a broadcast
    "top_parts_by_brand": (3, 1),
    # LSH candidate pipeline: fan-out + signature agg + band self-join
    "dedup_minhash_lsh": (4, 0),
    # TF-IDF weights: fan-out + tf agg + idf aggs; IDF joins broadcast
    "tfidf_vectors": (4, 1),
    "vocab_top_tokens": (3, 0),
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(spark, name):
    max_shuffle, min_broadcast = BUDGETS[name]
    a = audit_plan(entry_mod.queries()[name](spark, SF))
    assert a.shuffle_exchanges <= max_shuffle, (name, a)
    assert a.broadcast_exchanges >= min_broadcast, (name, a)
    assert a.cartesian_products == 0, (name, a)
    assert a.row_python_stages == 0, (name, a)


def test_map_only_queries_have_codegen(spark):
    """The scan-speed projections must actually compile (at least one
    whole-stage-codegen span), not fall back to interpreted eval."""
    for name in ("docs_split_sample", "text_normalize", "docs_pii_scrub"):
        a = audit_plan(entry_mod.queries()[name](spark, SF))
        assert a.codegen_spans >= 1, (name, a)


def test_audit_counts_python_stages(spark):
    """Sanity of the auditor itself: the deliberately-Arrow query is
    seen as such (guards against the audit regexes rotting)."""
    a = audit_plan(entry_mod.queries()["events_anomaly"](spark, SF))
    assert a.arrow_python_stages >= 1
    assert a.row_python_stages == 0
