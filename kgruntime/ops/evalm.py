"""Model-evaluation metrics as distributed exact-integer reductions.

The reference engine (turtle-syntax) has no evaluation surface — these
ops belong to the LLM-training-data suite: once a pipeline produces a
scorer (quality score, classifier, ranker), the next job at 100 TB is
"how good is it", and that job must itself be a streaming reduction,
not a driver-side sklearn call.

Scale shapes:

* ``binary_auc`` — tie-aware ROC AUC (Mann-Whitney U) WITHOUT a global
  sort: the corpus reduces to a per-score histogram of (pos, neg)
  counts via one native ``groupby(cents)``.  The shuffle carries at
  most |distinct score values| rows (bounded by the value range × the
  fixed-point scale, corpus-size-INDEPENDENT), and the driver finishes
  with one cumulative pass over that bounded histogram in arbitrary-
  precision Python ints (pos·cum_neg products overflow int64 around
  n ≈ 2³² rows — exactly the regime this op targets).
* ``langid_confusion`` — per-class precision / recall / F1 of the
  n-gram language classifier against the declared ``lang`` column.
  Per-batch combiner rows are (true, pred, n) partial counts; the
  exchange is ≤ |classes|² × |blocks| tiny rows, and every ratio is an
  exact integer ppm (``10⁶·tp // denom``) so the DuckDB twin replays
  bit-for-bit.

Both follow the repo's oracle-parity rules: fixed-point cents via
half-away rounding (CLAUDE.md), ppm ratios via floor division on
non-negative integers (identical in Python ``//`` and DuckDB ``//``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PPM = 1_000_000


def binary_auc(events_ds, pos_type: str = "purchase",
               value_col: str = "value", label_col: str = "event_type"):
    """Exact tie-aware AUC of ``value`` as a detector of
    ``event_type == pos_type`` — one row ``(n_pos, n_neg, auc_ppm)``.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), computed from the
    bounded (cents → pos, neg) histogram:
    U₂ = Σ_s pos(s)·(2·neg_below(s) + neg(s));
    auc_ppm = 10⁶·U₂ // (2·n_pos·n_neg).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        cents = pc.cast(pc.round(pc.multiply(t[value_col], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        lab = pc.cast(pc.equal(t[label_col], pos_type), pa.int64())
        d = pl.from_arrow(pa.Table.from_arrays([cents, lab],
                                               names=["cents", "lab"]))
        return d.group_by("cents").agg(
            pl.col("lab").sum().alias("pos"),
            (1 - pl.col("lab")).sum().alias("neg")).to_arrow()

    hist = events_ds.select_columns([value_col, label_col]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("cents") \
        .aggregate(Sum("pos", alias_name="pos"),
                   Sum("neg", alias_name="neg")) \
        .take_all()                      # ≤ |distinct cents| rows

    hist.sort(key=lambda r: r["cents"])
    u2 = 0
    n_pos = n_neg = 0
    cum_neg = 0
    for r in hist:                       # bounded loop, Python bigints
        p, n = int(r["pos"]), int(r["neg"])
        u2 += p * (2 * cum_neg + n)
        cum_neg += n
        n_pos += p
        n_neg += n
    auc_ppm = (_PPM * u2) // (2 * n_pos * n_neg) if n_pos and n_neg else 0
    return pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc_ppm": pa.array([auc_ppm], pa.int64()),
    })


def binary_auc_sql(pos_type: str = "purchase", value_col: str = "value",
                   label_col: str = "event_type",
                   table: str = "events") -> str:
    return f"""
WITH b AS (
  SELECT CAST(round({value_col} * 100) AS BIGINT) AS c,
         ({label_col} = '{pos_type}')::BIGINT AS lab
  FROM {table}),
h AS (
  SELECT c, sum(lab)::HUGEINT AS pos, sum(1 - lab)::HUGEINT AS neg
  FROM b GROUP BY c),
s AS (
  SELECT pos, neg,
         coalesce(sum(neg) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0::HUGEINT) AS nb
  FROM h),
t AS (
  SELECT sum(pos * (2 * nb + neg)) AS u2,
         sum(pos) AS np, sum(neg) AS nn
  FROM s)
SELECT np::BIGINT AS n_pos, nn::BIGINT AS n_neg,
       ((1000000 * u2) // (2 * np * nn))::BIGINT AS auc_ppm
FROM t
"""
