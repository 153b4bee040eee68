"""Skew-mitigation join strategies.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. The explicit salted
join here is the plan-level fallback for the cases AQE cannot fix --
e.g. one hot key whose rows must still meet ALL build-side rows, or
deterministic co-partitioning requirements. Semantics are identical to
a plain inner equi-join (oracle-checked).

How it works: the probe (large, skewed) side appends a random-free,
deterministic salt derived from a secondary column hash; the build side
is replicated once per salt value with ``explode``. The join key becomes
(key, salt), spreading a hot key over ``n_salts`` shuffle partitions.
Build-side replication cost: |build| * n_salts rows -- choose n_salts ~
(hot-key rows / target-partition-rows), small for dimension builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key_probe: str,
    key_build: str,
    n_salts: int = 8,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join with the probe side salted across ``n_salts``
    sub-keys and the build side replicated to match.

    ``salt_from``: probe column whose hash spreads rows of one key over
    salts (defaults to a whole-row-independent per-key spread via
    ``monotonically_increasing_id``-free hash of all probe columns --
    pass an id-ish column for stable plans).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # Replicating the build side n_salts times keeps inner/left joins
        # exact, but would emit each UNMATCHED build row once per salt
        # under right/full-outer semantics.
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}"
        )
    salt_src = F.col(salt_from) if salt_from else F.struct(*probe.columns)
    p = probe.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    if key_probe == key_build:
        # Same key name on both sides (the common equi-join case): the
        # join-on-names form merges key and salt into single output
        # columns -- a Column condition here would raise
        # AMBIGUOUS_REFERENCE and leave duplicate names downstream.
        return p.join(b, [key_probe, "_salt"], how).drop("_salt")
    # Distinct names: frame-qualified refs (bare F.col(key) is ambiguous
    # the moment other column names overlap between the inputs).
    out = p.join(
        b,
        (p[key_probe] == b[key_build]) & (p["_salt"] == b["_salt"]),
        how,
    )
    return out.drop(p["_salt"]).drop(b["_salt"])


def salted_join_auto(
    probe: DataFrame,
    build: DataFrame,
    key_probe: str,
    key_build: str,
    n_salts: int = 8,
    factor: float = 4.0,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Hybrid skew join: measure first, salt ONLY the hot keys.

    ``salted_join`` replicates the ENTIRE build side ``n_salts`` times;
    when only a handful of keys are hot that multiplies build rows for
    keys that never needed it. This variant runs
    :func:`..stats.heavy_hitters` on the probe side (one partial-agg
    count, the diagnostic is a small table), broadcast-tags both inputs
    with the hot-key set, and unions:

    * cold rows -> plain equi-join (no replication, no salt column);
    * hot rows  -> salted join with build replication restricted to the
      (tiny) hot-key slice.

    Build replication cost drops from |build| x n_salts to
    |hot build rows| x n_salts. Results are identical to a plain join
    for inner/left (property-tested); the same outer-join caveat as
    ``salted_join`` applies, enforced there.

    At 100 TB: the measurement pass re-scans the probe side once --
    cheaper than a blown shuffle partition; persist the probe first if
    its lineage is expensive.
    """
    from .stats import heavy_hitters

    hot = F.broadcast(
        heavy_hitters(probe.select(key_probe), key_probe, factor=factor)
        .select(F.col(key_probe).alias("_hotkey"))
    )
    p_hot = probe.join(hot, probe[key_probe] == F.col("_hotkey"), "left_semi")
    p_cold = probe.join(hot, probe[key_probe] == F.col("_hotkey"), "left_anti")
    b_hot = build.join(hot, build[key_build] == F.col("_hotkey"), "left_semi")
    b_cold = build.join(hot, build[key_build] == F.col("_hotkey"), "left_anti")
    if key_probe == key_build:
        # join-on-name merges the key column, mirroring salted_join's
        # same-name branch so the hot/cold union columns line up.
        cold = p_cold.join(b_cold, key_probe, how)
    else:
        cold = p_cold.join(
            b_cold, p_cold[key_probe] == b_cold[key_build], how
        )
    hot_joined = salted_join(
        p_hot, b_hot, key_probe, key_build,
        n_salts=n_salts, salt_from=salt_from, how=how,
    )
    return cold.unionByName(hot_joined.select(*cold.columns))
