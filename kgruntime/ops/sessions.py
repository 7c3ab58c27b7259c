"""Sessionization / windowed aggregates over the events log
(ray_guide "Streaming-shaped workloads" pattern).

Ray Data has no event-time windows; the idiom is: partition by key,
sort within the group, and window with pandas inside
``groupby(key).map_groups``.  The ordering assumption (events of one
user fit one group and sort by ts) is stated here and holds because
groups are per-user.

Both operators carry exact DuckDB oracles (window functions), so they
run under the driver's value-hash gate.
"""

from __future__ import annotations

import pandas as pd

SESSION_GAP_MIN = 30


def _sessionize_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    gap = g["ts"].diff().dt.total_seconds().div(60)
    new_session = (gap.isna() | (gap > SESSION_GAP_MIN)).cumsum()
    import numpy as np

    # sum exact integer cents, not floats: float sums are summation-
    # order-dependent in the last ulp, which breaks the value-hash gate
    # (the oracle SQL mirrors the cents formula)
    g = g.assign(cents=np.rint(g["value"].to_numpy() * 100).astype(np.int64))
    out = g.groupby(new_session).agg(
        user_id=("user_id", "first"),
        session_start=("ts", "min"),
        n_events=("event_id", "count"),
        cents=("cents", "sum"),
    )
    out["total_value"] = out.pop("cents") / 100.0
    return out.reset_index(drop=True)


def sessionize(events_ds):
    """events → one row per (user, session): 30-minute-gap sessions.

    Output: (user_id, session_start, n_events, total_value).
    """
    return events_ds.groupby("user_id").map_groups(
        _sessionize_group, batch_format="pandas")


SESSIONIZE_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM sessions GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def tumbling_hourly(events_ds):
    """Tumbling 1-hour windows per event_type:
    (event_type, window_start, n_events, total_value).

    A plain (type, hour) rollup — native hash ``groupby().aggregate``
    (pre-aggregated per block by Ray), NOT ``map_groups``: with ~5 event
    types a per-type pandas group would hold 1/5 of the whole corpus in
    one worker's heap.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                    pa.timestamp("us"))
        # exact integer cents: distributed float sums are summation-
        # order-dependent in the last ulp (oracle mirrors the formula)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.Table.from_arrays(
            [t["event_type"], w, cents],
            names=["event_type", "window_start", "cents"])

    def finish(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("cents")
        total = pc.divide(pc.cast(t["cents"], pa.float64()), 100.0)
        return t.set_column(i, "total_value", total)

    return events_ds.map_batches(add_window, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby(["event_type", "window_start"]) \
        .aggregate(Count(alias_name="n_events"),
                   Sum("cents", alias_name="cents")) \
        .map_batches(finish, batch_format="pyarrow")


TUMBLING_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""
