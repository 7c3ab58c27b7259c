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


def decile_lift(events_ds, pos_type: str = "purchase",
                value_col: str = "value", label_col: str = "event_type"):
    """Decile lift / calibration table for ``value`` as a detector of
    ``label == pos_type``: events bucket into value deciles (exact
    discrete order statistics, DuckDB ``quantile_disc`` rule — 1-based
    index ⌈q·n⌉) and each bucket reports
    ``(bin, n_events, n_pos, rate_ppm, lift_ppm)`` where lift is the
    bin's positive rate over the overall rate, both exact integer ppm.
    Heavy ties can collapse adjacent deciles — identically on both
    sides, so the twin still hash-matches.

    Scale shape: the SAME bounded (cents → pos, neg) histogram as
    :func:`binary_auc` — one combiner ``groupby``, driver finish over
    |distinct cents| rows; boundaries, bins, and ratios all come from
    cumulative counts, so no second corpus pass and no global sort.
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
            pl.len().cast(pl.Int64).alias("cnt")).to_arrow()

    hist = events_ds.select_columns([value_col, label_col]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("cents") \
        .aggregate(Sum("pos", alias_name="pos"),
                   Sum("cnt", alias_name="cnt")) \
        .take_all()

    hist.sort(key=lambda r: r["cents"])
    cents = np.array([r["cents"] for r in hist], np.int64)
    cnt = np.array([int(r["cnt"]) for r in hist], np.int64)
    pos = np.array([int(r["pos"]) for r in hist], np.int64)
    cum = np.cumsum(cnt)
    n_total = int(cum[-1])
    p_total = int(pos.sum())

    # decile boundaries: value of the ceil(k·n/10)-th row (1-based)
    bounds = []
    for k in range(1, 10):
        rank = (k * n_total + 9) // 10          # ceil as exact ints
        bounds.append(int(cents[np.searchsorted(cum, rank, "left")]))
    bounds = np.array(bounds, np.int64)

    # bin of each distinct cents value: 1 + #boundaries strictly below
    bins = 1 + np.searchsorted(bounds, cents, side="left")
    rows = []
    for b in np.unique(bins):
        m = bins == b
        n_b, p_b = int(cnt[m].sum()), int(pos[m].sum())
        rate = (1_000_000 * p_b) // n_b
        lift = ((1_000_000 * p_b * n_total) // (n_b * p_total)
                if p_total else 0)
        rows.append((int(b), n_b, p_b, rate, lift))
    return pa.table({
        "bin": pa.array([r[0] for r in rows], pa.int64()),
        "n_events": pa.array([r[1] for r in rows], pa.int64()),
        "n_pos": pa.array([r[2] for r in rows], pa.int64()),
        "rate_ppm": pa.array([r[3] for r in rows], pa.int64()),
        "lift_ppm": pa.array([r[4] for r in rows], pa.int64()),
    })


def decile_lift_sql(pos_type: str = "purchase", value_col: str = "value",
                    label_col: str = "event_type",
                    table: str = "events") -> str:
    qs = ", ".join(f"{k / 10:.1f}" for k in range(1, 10))
    return f"""
WITH dl_b AS (
  SELECT CAST(round({value_col} * 100) AS BIGINT) AS c,
         ({label_col} = '{pos_type}')::BIGINT AS lab
  FROM {table}),
dl_bnd AS (SELECT quantile_disc(c, [{qs}]) AS bs FROM dl_b),
dl_binned AS (
  SELECT c, lab,
         1 + len(list_filter(bnd.bs, x -> x < c))::BIGINT AS bin
  FROM dl_b, dl_bnd bnd),
dl_tot AS (SELECT count(*)::BIGINT AS n, sum(lab)::BIGINT AS p FROM dl_b)
SELECT bin, count(*)::BIGINT AS n_events, sum(lab)::BIGINT AS n_pos,
       ((1000000 * sum(lab)) // count(*))::BIGINT AS rate_ppm,
       CASE WHEN (SELECT p FROM dl_tot) = 0 THEN 0
            ELSE ((1000000::HUGEINT * sum(lab) * (SELECT n FROM dl_tot))
                  // (count(*) * (SELECT p FROM dl_tot)))::BIGINT
       END AS lift_ppm
FROM dl_binned GROUP BY bin ORDER BY bin
"""
