"""Mirror of the driver's t2 correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
and require identical (order-insensitive) values.

Scale factor defaults to sf0.001 for speed; set ORACLE_SF=0.01 to run at
the driver's gate scale.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from sparkbigdatatextanalysis_spark.sources.parquet_io import TABLES

SF = os.environ.get("ORACLE_SF", "0.001")
SF_DIR = f"/root/testdata/sf{SF}"

KEYS = sorted(entrymod.queries().keys())

# Sampled rotation for the EXPENSIVE scale sweep (r10 verdict item 5:
# the full ORACLE_SF=0.1 sweep costs ~30 min — the driver-gate
# rotation pattern applied to the suite): ORACLE_SAMPLE=even|odd keeps
# the md5-parity half of the keys, so running "even" one round and
# "odd" the next covers every key per round-pair at half the per-round
# cost. Unset (the default, and the sf0.001 tier in every suite run)
# keeps ALL keys — the cheap tier never samples.
_SAMPLE = os.environ.get("ORACLE_SAMPLE", "")
if _SAMPLE in ("even", "odd"):
    import hashlib as _hl

    _want = 0 if _SAMPLE == "even" else 1
    KEYS = [
        k
        for k in KEYS
        if int(_hl.md5(k.encode()).hexdigest(), 16) % 2 == _want
    ]
elif _SAMPLE:
    raise ValueError(f"ORACLE_SAMPLE must be even|odd, got {_SAMPLE!r}")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _null_or_str(v) -> str:
    # the driver's normalization: SQL NULL -> "NULL" regardless of how
    # the client lib surfaced it (Spark gives None in an object column,
    # DuckDB gives float nan for a NULL-carrying BOOLEAN) -- without
    # this a nullable boolean column canonicalizes to 'None' vs 'nan'
    # and a value-identical result mismatches on representation
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    return str(v)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_bool_dtype(dt):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].map(_null_or_str)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


@pytest.mark.parametrize("key", KEYS)
def test_oracle_match(spark, key):
    oracle = entrymod.oracle_sql()
    if key not in oracle:
        pytest.skip(f"{key}: no SQL oracle (rows-only check)")
    got = _canon(entrymod.queries()[key](spark, SF_DIR).toPandas())
    exp = _canon(_duck(oracle[key]))
    assert list(got.columns) == list(exp.columns), (
        f"{key}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{key}: {len(got)} rows != {len(exp)}"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if got[c].dtype == "float64":
            both_nan = np.isnan(g) & np.isnan(e)
            ok = both_nan | (g == e)
            assert ok.all(), (
                f"{key}.{c}: {int((~ok).sum())} mismatches, "
                f"max abs diff {np.nanmax(np.abs(g - e))}"
            )
        else:
            mism = g != e
            assert not mism.any(), (
                f"{key}.{c}: {int(mism.sum())} mismatches, first: "
                f"{g[mism][:3]} vs {e[mism][:3]}"
            )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
