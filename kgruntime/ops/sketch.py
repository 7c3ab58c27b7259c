"""HyperLogLog distinct-count sketch — the mergeable-sketch shape for
counting distinct keys per group without shuffling the keys.

Scale shape: every batch reduces to at most ``m`` (register) rows per
group — a native ``groupby(group, register).Max`` merges them, so the
exchange carries |groups| × m × |blocks| tiny rows while the raw keys
(user ids, URLs, ...) never leave their block.  The classic trade
against ``groupby(key).distinct`` (which must shuffle every key once).

SQL replayability: the register index/rank are derived from the md5-60
primitive (same as the LSH family), the register sum Σ2^-M_j is kept as
an EXACT dyadic integer Σ2^(RANK_MAX-M_j) / 2^RANK_MAX (64 exact ints —
no float-accumulation order dependence), and the raw estimate
α·m²/S is two IEEE ops on identical operands.  The small-range
(linear-counting) correction is deliberately omitted — it needs ln(),
whose last-ulp behavior is libm-specific; the raw estimator's low-
cardinality bias is documented instead and the exact-count twin
(``distinct_users_per_type``) covers the small regime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _md5_60

_HLL_B = 6                     # 2^6 = 64 registers
_HLL_M = 1 << _HLL_B
_ALPHA_64 = 0.709              # standard alpha_m for m=64
_RANK_BITS = 60 - _HLL_B       # 54 hash bits feed the rank
_RANK_MAX = _RANK_BITS + 1     # rank of an all-zero word


def _hll_partial(t: pa.Table, group: str, key: str) -> pa.Table:
    """Batch → per-(group, register) max rank (≤ |groups|·m rows).
    Rank via exact int.bit_length() in the same per-row pass as the md5
    (which dominates); everything downstream is vectorized/native."""
    reg, rank = [], []
    for k in t[key].to_pylist():
        h = _md5_60(str(k).encode())
        reg.append(h % _HLL_M)
        w = h >> _HLL_B
        rank.append(_RANK_MAX if w == 0 else _RANK_BITS - w.bit_length() + 1)
    df = pd.DataFrame({group: t[group].to_pandas(),
                       "reg": np.asarray(reg, np.int64),
                       "rank": np.asarray(rank, np.int64)})
    g = df.groupby([group, "reg"], sort=False)["rank"].max().reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def hll_distinct(ds, group: str = "event_type", key: str = "user_id",
                 digits: int = 4):
    """Approximate distinct ``key`` count per ``group`` —
    (group, n_registers, reg_sum_scaled, est_distinct).

    ``reg_sum_scaled`` is the exact integer Σ_j 2^(RANK_MAX − M_j)
    (empty registers contribute 2^RANK_MAX), so the estimate
    α·m² / (reg_sum_scaled / 2^RANK_MAX) is bit-deterministic under any
    merge order.  Raw HLL estimator only (see module docstring).
    """
    from functools import partial as _p

    from ray.data.aggregate import Max

    regs = ds.select_columns([group, key]) \
        .map_batches(_p(_hll_partial, group=group, key=key),
                     batch_format="pyarrow", zero_copy_batch=True) \
        .groupby([group, "reg"]) \
        .aggregate(Max("rank", alias_name="rank")).to_pandas()

    rows = []
    for gval, g in regs.groupby(group, sort=True):
        ranks = dict(zip(g["reg"], g["rank"]))
        ssum = sum(1 << (_RANK_MAX - int(ranks.get(j, 0)))
                   for j in range(_HLL_M))
        s = ssum / float(1 << _RANK_MAX)
        est = _ALPHA_64 * _HLL_M * _HLL_M / s
        est = np.floor(est * 10.0 ** digits + 0.5) / 10.0 ** digits
        rows.append({group: gval, "n_registers": _HLL_M,
                     "reg_sum_scaled": ssum, "est_distinct": est})
    return pd.DataFrame(
        rows, columns=[group, "n_registers", "reg_sum_scaled",
                       "est_distinct"]).reset_index(drop=True)


def hll_distinct_sql(group: str = "event_type", key: str = "user_id",
                     digits: int = 4, table: str = "events") -> str:
    """DuckDB oracle: identical registers from the md5-60 primitive —
    bit_length via length(bin(w)) of the positive word (exact integer),
    the same exact dyadic register sum, and the same two IEEE ops."""
    m, b, rmax = _HLL_M, _HLL_B, _RANK_MAX
    return f"""
WITH h AS (
  SELECT {group} AS grp,
         ('0x' || substr(md5({key}::VARCHAR), 1, 15))::BIGINT AS hv
  FROM {table}),
r AS (
  SELECT grp, hv % {m} AS reg,
         CASE WHEN hv // {m} = 0 THEN {rmax}
              ELSE {_RANK_BITS} - length(ltrim(bin(hv // {m}), '0')) + 1
         END AS rank
  FROM h),
mx AS (
  SELECT grp, reg, max(rank) AS rank FROM r GROUP BY grp, reg),
s AS (
  SELECT grp,
         sum((1::BIGINT << ({rmax} - rank)))::BIGINT
           + ({m} - count(*)) * (1::BIGINT << {rmax}) AS reg_sum_scaled
  FROM mx GROUP BY grp)
SELECT grp AS {group}, {m} AS n_registers, reg_sum_scaled,
       round({_ALPHA_64} * {m} * {m}
             / (reg_sum_scaled / (1::BIGINT << {rmax})::DOUBLE), {digits})
  AS est_distinct
FROM s ORDER BY {group}
"""


# --- Bloom-filter distinct sketch ------------------------------------------

_BLOOM_M = 1 << 15          # bits
_BLOOM_K = 4                # hash functions (four 15-bit slices of md5-60)


def bloom_distinct_user_days(events_ds, m: int = _BLOOM_M,
                             k: int = _BLOOM_K):
    """Mergeable Bloom sketch of distinct (user, activity-day) pairs —
    (m, k, n_set_bits, est_distinct).

    The k indexes are disjoint 15-bit slices of the md5-60 of
    ``"{user}-{day}"`` — SQL-replayable, and the set-bit union is
    merge-order-independent (a Bloom OR), so ``n_set_bits`` is exact on
    both engines; the float estimator ``-m/k · ln(1 − X/m)`` is derived
    from it (kept out of the hash-checked projection — libm ln is not
    cross-engine-guaranteed in the last ulp).

    Scale shape: each batch emits its DISTINCT bit indexes (≤ m rows —
    the sketch, never the pairs); one tiny groupby dedups them.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .dedup import _md5_60

    assert m == 1 << 15 and k <= 4, "indexes are 15-bit md5-60 slices"

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        users = t["user_id"].to_pylist()
        idx = set()
        for u, d in zip(users, day.to_pylist()):
            h = _md5_60(f"{u}-{d}".encode())
            for i in range(k):
                idx.add((h >> (15 * i)) & (m - 1))
        return pa.table({"idx": pa.array(sorted(idx), pa.int64())})

    bits = events_ds.select_columns(["user_id", "ts"]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("idx").count()
    n_set = bits.count()
    est = -m / k * float(np.log1p(-n_set / m))
    return pd.DataFrame({
        "m": [m], "k": [k], "n_set_bits": [int(n_set)],
        "est_distinct": [float(np.copysign(
            np.floor(abs(est) * 1e4 + 0.5), est) / 1e4)],
    })


def bloom_distinct_sql(m: int = _BLOOM_M, k: int = _BLOOM_K,
                       table: str = "events") -> str:
    """Oracle for the EXACT part of the sketch (m, k, n_set_bits); the
    float estimator stays out of the checked projection."""
    return f"""
WITH pairs AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM {table}),
h AS (
  SELECT ('0x' || substr(md5(user_id::VARCHAR || '-' || day::VARCHAR),
                         1, 15))::BIGINT AS h60
  FROM pairs),
idx AS (
  SELECT DISTINCT (h60 >> (15 * t.i)) & {m - 1} AS idx
  FROM h CROSS JOIN range(0, {k}) AS t(i))
SELECT {m} AS m, {k} AS k, count(*) AS n_set_bits FROM idx
"""
