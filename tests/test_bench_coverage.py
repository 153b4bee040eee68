"""Bench coverage contract (r10 verdict "What's missing #2"): every
queries() key is either timed in bench.py's HEADLINE/WITNESS sets or
listed in BENCH_EXCLUDED with a written rationale -- so a per-query
plan regression anywhere in the gated surface is visible in the bench
artifact, and every omission is a documented decision.

No Spark session needed: this only inspects the registries.
"""

from __future__ import annotations

import bench
import __spark_entry__ as entrymod


def test_every_query_key_benched_or_excluded():
    qkeys = set(entrymod.queries().keys())
    covered = set(bench.HEADLINE) | set(bench.WITNESS) | set(
        bench.BENCH_EXCLUDED
    )
    missing = sorted(qkeys - covered)
    assert not missing, f"gated keys absent from bench registries: {missing}"


def test_bench_registries_are_disjoint_and_clean():
    head, wit, exc = (
        list(bench.HEADLINE),
        list(bench.WITNESS),
        set(bench.BENCH_EXCLUDED),
    )
    assert len(head) == len(set(head)), "duplicate HEADLINE entries"
    assert not set(head) & set(wit)
    assert not set(head) & exc
    assert not set(wit) & exc
    qkeys = set(entrymod.queries().keys())
    extra_keys = set(bench.EXTRA)
    # every timed name resolves to a gated query or a bench-only EXTRA
    for name in head + wit:
        assert name in qkeys or name in extra_keys, name
    # exclusions must name gated keys and carry a non-trivial rationale
    for name, why in bench.BENCH_EXCLUDED.items():
        assert name in qkeys, name
        assert isinstance(why, str) and len(why) > 20, name
