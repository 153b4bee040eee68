"""Streaming approximate-distinct sketches: per-key (e.g. per-day) HLL
register state maintained ONLINE across micro-batches.

The streaming gap the batch sketch rollup (X131, ``hll_sketch_agg``)
leaves open: a dashboard that needs "uniques so far today" cannot
re-aggregate raw history per trigger, and exact distinct state grows
with the number of distinct users. Here the per-key state is a FIXED
2^P-register HyperLogLog (one byte per register -- 1 KiB at P=10,
rsd ~ 1.04/sqrt(2^P) ~ 3.25%), carried as a BINARY column through
``applyInPandasWithState``; each micro-batch only max-merges its ids'
register updates, and the estimate re-emits per key per batch (append
output semantics -- the progression of estimates IS the output, like
the compaction change-log; readers take the max-registers row per
key).

Determinism: our own md5-derived register hash (the house cross-engine
hashing style -- NOT a library sketch), so the streamed estimate is a
pure function of the SET of ids seen: any micro-batch split, ordering
or replay yields byte-identical registers (register updates are
idempotent maxes). The test twin :func:`batch_uniques_estimate` builds the same
registers independently and must match the streamed estimates exactly
under ANY micro-batch split (register maxes are idempotent and
order-free); accuracy vs exact distinct is bounded by the rsd. At
batch scale use X131's native ``hll_sketch_agg`` instead -- this
module exists for the state-store path, where the register array must
live inside per-key streaming state.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..serde import ship_by_value

# Worker-bound closures travel by value so executor Python workers
# never need this package on their own sys.path (see serde.py).
ship_by_value(__name__)

P = 10                      # 2^10 = 1024 registers, rsd ~ 3.25%
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)  # standard HLL bias constant for m >= 128

OUTPUT_SCHEMA = "day STRING, est_uniques DOUBLE, n_registers_set BIGINT"
STATE_SCHEMA = "regs BINARY"


def _reg_update(id_str: str) -> tuple[int, int]:
    """(register index, rank) for one id: md5-derived, engine- and
    platform-independent. Rank = leading-zero count of the remaining
    bits + 1, capped so it always fits a uint8 register."""
    h = int.from_bytes(hashlib.md5(id_str.encode()).digest()[:8], "big")
    idx = h >> (64 - P)
    rest = h & ((1 << (64 - P)) - 1)
    # rank: position of the first 1-bit in the low 64-P bits
    rank = (64 - P) - rest.bit_length() + 1
    return idx, rank


def _estimate(regs: bytes) -> tuple[float, int]:
    inv = 0.0
    zeros = 0
    for r in regs:
        inv += 2.0 ** (-r)
        if r == 0:
            zeros += 1
    raw = _ALPHA * M * M / inv
    if raw <= 2.5 * M and zeros:
        # small-range (linear counting) correction
        import math

        est = M * math.log(M / zeros)
    else:
        est = raw
    return est, M - zeros


def _merge_ids(regs: bytearray, ids) -> None:
    for s in ids:
        idx, rank = _reg_update(str(s))
        if regs[idx] < rank:
            regs[idx] = rank


def _sketch_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (day,) = key
    regs = bytearray(state.get[0]) if state.exists else bytearray(M)
    for pdf in pdfs:
        _merge_ids(regs, pdf["id"].tolist())
    state.update((bytes(regs),))
    est, nset = _estimate(bytes(regs))
    yield pd.DataFrame(
        {
            "day": [day],
            "est_uniques": [float(est)],
            "n_registers_set": [int(nset)],
        }
    )


def streaming_daily_uniques(
    events: DataFrame,
    key_col: str = "day",
    id_col: str = "user_id",
) -> DataFrame:
    """Per-``key_col`` online distinct-``id_col`` estimates: one output
    row per (key, micro-batch) carrying the estimate over everything
    seen so far. State is one 2^P-byte register array per key --
    bounded however many ids stream in. ``events`` must already carry
    the string key column (day, hour, tenant...)."""
    prepared = events.select(
        F.col(key_col).alias("day"), F.col(id_col).cast("string").alias("id")
    )
    return prepared.groupBy("day").applyInPandasWithState(
        _sketch_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_uniques_estimate(
    df: DataFrame, key_col: str = "day", id_col: str = "user_id"
) -> "pd.DataFrame":
    """Driver-side exact twin of the streamed estimates for testing:
    builds the SAME registers in Python over the collected distinct
    (key, id) pairs (test fixtures are small; the streamed form is the
    scale path). Returns a pandas frame (day, est_uniques,
    n_registers_set)."""
    rows = (
        df.select(F.col(key_col).alias("day"), F.col(id_col).cast("string").alias("id"))
        .distinct()
        .collect()
    )
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["day"], bytearray(M))
    for r in rows:
        _merge_ids(by_key[r["day"]], [r["id"]])
    out = []
    for day, regs in sorted(by_key.items()):
        est, nset = _estimate(bytes(regs))
        out.append({"day": day, "est_uniques": float(est), "n_registers_set": nset})
    return pd.DataFrame(out)
