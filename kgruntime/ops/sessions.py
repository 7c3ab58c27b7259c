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
    out = g.groupby(new_session).agg(
        user_id=("user_id", "first"),
        session_start=("ts", "min"),
        n_events=("event_id", "count"),
        total_value=("value", "sum"),
    )
    out["total_value"] = out["total_value"].round(4)
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
       round(sum(value), 4) AS total_value
FROM sessions GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def _tumbling_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.copy()
    g["window_start"] = g["ts"].dt.floor("1h")
    out = g.groupby("window_start").agg(
        event_type=("event_type", "first"),
        n_events=("event_id", "count"),
        total_value=("value", "sum"),
    )
    out["total_value"] = out["total_value"].round(4)
    return out.reset_index()


def tumbling_hourly(events_ds):
    """Tumbling 1-hour windows per event_type:
    (event_type, window_start, n_events, total_value)."""
    out = events_ds.groupby("event_type").map_groups(
        _tumbling_group, batch_format="pandas")
    return out.select_columns(["event_type", "window_start", "n_events",
                               "total_value"])


TUMBLING_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""
