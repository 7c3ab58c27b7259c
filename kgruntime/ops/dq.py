"""Data-quality constraint audit — the validation pass a training-data
pipeline runs before trusting an ingest (null checks, domain ranges,
primary-key uniqueness, foreign-key integrity, policy thresholds).

Scale shape:

* Scalar column checks are ONE vectorized Arrow pass per table: each
  batch emits a handful of ``(check_name, n)`` partial rows (n_checks
  rows per block, never per record) and one tiny ``groupby(check_name)``
  sums them — the exchange is O(n_checks × n_blocks).
* PK-uniqueness ships ``(key, 1)`` partial counts through one
  int-keyed groupby and counts keys whose total exceeds 1.
* FK integrity avoids join machinery entirely: both sides map into a
  shared ``(key, n_child, n_parent)`` keyspace (child batches emit
  per-batch key counts, parent batches emit batch-deduped marker rows),
  ONE ``groupby(key)`` sums both columns, and a violation is a key with
  ``n_parent == 0`` — the only exchange is 24-byte int rows, and the
  per-batch ``np.unique`` combiner collapses duplicates before the
  shuffle.  This is the same side-tagged-union shape
  ``ops/dedup.py:corpus_diff`` uses.

The audit report is a handful of rows, so the final assembly happens on
the driver from scalar aggregates (each one the END of a streamed
distributed reduction — nothing upstream materializes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_PARTIAL_SCHEMA = pa.schema([("check_name", pa.string()),
                             ("n", pa.int64())])


def _check_rows(counts: dict[str, int]) -> pa.Table:
    names = sorted(counts)
    return pa.table({"check_name": pa.array(names, pa.string()),
                     "n": pa.array([int(counts[k]) for k in names],
                                   pa.int64())},
                    schema=_PARTIAL_SCHEMA)


def _nsum(arr) -> int:
    v = pc.sum(arr).as_py()
    return int(v) if v is not None else 0


def _scalar_checks(ds, partial_fn) -> dict[str, int]:
    """Run one vectorized pass emitting per-batch check partials and
    sum them with a tiny groupby."""
    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial_fn, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("check_name").aggregate(Sum("n", alias_name="n"))
    return {r["check_name"]: int(r["n"]) for r in agg.take_all()}


def _dup_pk_count(ds, key: str) -> int:
    """Number of key values appearing more than once (one int-keyed
    groupby; per-batch combiner collapses in-batch repeats first)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys, cnt = np.unique(
            t[key].combine_chunks().to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({key: keys.astype(np.int64),
                         "n": cnt.astype(np.int64)})

    per_key = ds.select_columns([key]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby(key).aggregate(Sum("n", alias_name="n"))

    def dups(t: pa.Table) -> pa.Table:
        return _check_rows({"d": _nsum(pc.greater(t["n"], 1))})

    out = per_key.map_batches(dups, batch_format="pyarrow").sum("n")
    return int(out or 0)


def _fk_violations(child_ds, child_key: str,
                   parent_ds, parent_key: str) -> int:
    """Child rows whose key has no parent: side-tagged shared keyspace,
    one groupby, no join."""
    from ray.data.aggregate import Sum

    def child_part(t: pa.Table) -> pa.Table:
        keys, cnt = np.unique(
            t[child_key].combine_chunks().to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"key": keys.astype(np.int64),
                         "n_child": cnt.astype(np.int64),
                         "n_parent": np.zeros(len(keys), np.int64)})

    def parent_part(t: pa.Table) -> pa.Table:
        keys = np.unique(
            t[parent_key].combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table({"key": keys.astype(np.int64),
                         "n_child": np.zeros(len(keys), np.int64),
                         "n_parent": np.ones(len(keys), np.int64)})

    tagged = child_ds.select_columns([child_key]) \
        .map_batches(child_part, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .union(parent_ds.select_columns([parent_key])
               .map_batches(parent_part, batch_format="pyarrow",
                            zero_copy_batch=True))
    per_key = tagged.groupby("key").aggregate(
        Sum("n_child", alias_name="n_child"),
        Sum("n_parent", alias_name="n_parent"))

    def orphans(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["n_parent"], 0)
        return _check_rows(
            {"o": _nsum(pc.if_else(mask, t["n_child"], 0))})

    return int(per_key.map_batches(orphans,
                                   batch_format="pyarrow").sum("n") or 0)


def dq_audit(orders_ds, lineitem_ds, customer_ds) -> pd.DataFrame:
    """Full audit: (check_name, n_violations) — hard integrity checks
    (nulls, domains, PK, FK: expected 0 on a clean ingest) plus policy
    thresholds (expected non-zero) so both paths stay exercised."""

    def li_partial(t: pa.Table) -> pa.Table:
        qty, disc = t["l_quantity"], t["l_discount"]
        return _check_rows({
            "lineitem_null_quantity": _nsum(pc.is_null(qty)),
            "lineitem_quantity_domain": _nsum(pc.or_(
                pc.less(qty, 1.0), pc.greater(qty, 50.0))),
            "lineitem_discount_domain": _nsum(pc.or_(
                pc.less(disc, 0.0), pc.greater(disc, 0.1))),
            "lineitem_policy_qty_gt45": _nsum(pc.greater(qty, 45.0)),
            "lineitem_policy_disc_gt8pct": _nsum(
                pc.greater(disc, 0.08)),
        })

    def o_partial(t: pa.Table) -> pa.Table:
        tot = t["o_totalprice"]
        return _check_rows({
            "orders_null_custkey": _nsum(pc.is_null(t["o_custkey"])),
            "orders_nonpositive_total": _nsum(
                pc.less_equal(tot, 0.0)),
        })

    counts: dict[str, int] = {}
    counts.update(_scalar_checks(
        lineitem_ds.select_columns(["l_quantity", "l_discount"]),
        li_partial))
    counts.update(_scalar_checks(
        orders_ds.select_columns(["o_custkey", "o_totalprice"]),
        o_partial))
    counts["orders_dup_orderkey"] = _dup_pk_count(orders_ds,
                                                  "o_orderkey")
    counts["lineitem_fk_orderkey"] = _fk_violations(
        lineitem_ds, "l_orderkey", orders_ds, "o_orderkey")
    counts["orders_fk_custkey"] = _fk_violations(
        orders_ds, "o_custkey", customer_ds, "c_custkey")

    names = sorted(counts)
    return pd.DataFrame({
        "check_name": names,
        "n_violations": np.array([counts[k] for k in names],
                                 np.int64)})


DQ_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'lineitem_null_quantity' AS check_name,
         count(*) FILTER (l_quantity IS NULL)::BIGINT AS n_violations
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_quantity_domain',
         count(*) FILTER (l_quantity < 1 OR l_quantity > 50)::BIGINT
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_discount_domain',
         count(*) FILTER (l_discount < 0 OR l_discount > 0.1)::BIGINT
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_policy_qty_gt45',
         count(*) FILTER (l_quantity > 45)::BIGINT FROM lineitem
  UNION ALL
  SELECT 'lineitem_policy_disc_gt8pct',
         count(*) FILTER (l_discount > 0.08)::BIGINT FROM lineitem
  UNION ALL
  SELECT 'orders_null_custkey',
         count(*) FILTER (o_custkey IS NULL)::BIGINT FROM orders
  UNION ALL
  SELECT 'orders_nonpositive_total',
         count(*) FILTER (o_totalprice <= 0)::BIGINT FROM orders
  UNION ALL
  SELECT 'orders_dup_orderkey', count(*)::BIGINT FROM (
    SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
  UNION ALL
  SELECT 'lineitem_fk_orderkey', count(*)::BIGINT
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL
  UNION ALL
  SELECT 'orders_fk_custkey', count(*)::BIGINT
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
) ORDER BY check_name
"""
