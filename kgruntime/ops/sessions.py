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
import pyarrow as pa

SESSION_GAP_MIN = 30


def _sessionize_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    gap = g["ts"].diff().dt.total_seconds().div(60)
    new_session = (gap.isna() | (gap > SESSION_GAP_MIN)).cumsum()
    import numpy as np

    # sum exact integer cents, not floats: float sums are summation-
    # order-dependent in the last ulp, which breaks the value-hash gate
    # (the oracle SQL mirrors the cents formula)
    # half-away-from-zero like DuckDB round() — np.rint is banker's
    v = g["value"].to_numpy() * 100
    g = g.assign(cents=np.copysign(np.floor(np.abs(v) + 0.5), v)
                 .astype(np.int64))
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
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
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


def hopping_windows(events_ds, size_hours: int = 2, hop_hours: int = 1):
    """Hopping (sliding) windows per event_type: each event lands in
    ``size/hop`` overlapping windows.  Output (event_type, window_start,
    n_events, total_value).

    Scale shape: the explode is per-batch (each batch emits size/hop
    copies with shifted window starts — vectorized concat, no Python
    rows), then ONE native hash groupby; the shuffle carries the
    aggregated (type, window) rows, pre-combined per block by Ray.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    if size_hours % hop_hours:
        raise ValueError("size_hours must be a multiple of hop_hours")
    n_copies = size_hours // hop_hours

    def explode(t: pa.Table) -> pa.Table:
        base = pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                       pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        parts = []
        for i in range(n_copies):
            w = pc.subtract(base, pa.scalar(i * hop_hours * 3_600_000_000,
                                            pa.duration("us")))
            parts.append(pa.Table.from_arrays(
                [t["event_type"], pc.cast(w, pa.timestamp("us")), cents],
                names=["event_type", "window_start", "cents"]))
        return pa.concat_tables(parts)

    def finish(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("cents")
        return t.set_column(
            i, "total_value",
            pc.divide(pc.cast(t["cents"], pa.float64()), 100.0))

    return events_ds.map_batches(explode, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby(["event_type", "window_start"]) \
        .aggregate(Count(alias_name="n_events"),
                   Sum("cents", alias_name="cents")) \
        .map_batches(finish, batch_format="pyarrow")


HOPPING_2H_1H_SQL = """
SELECT event_type,
       date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS window_start,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events CROSS JOIN range(0, 2) AS t(i)
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


def _gap_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    # integer microseconds end-to-end: float seconds would accumulate
    # representation error and drift from the epoch_us() oracle
    # (explicit datetime64[us] — pandas resolution is version-dependent)
    us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    gaps = us[1:] - us[:-1]
    if len(gaps) == 0:
        return pd.DataFrame(columns=["user_id", "n_gaps", "avg_gap_sec",
                                     "max_gap_sec"])
    avg = (float(gaps.sum()) / len(gaps)) / 1e6
    import numpy as np

    avg = float(np.copysign(np.floor(abs(avg) * 1e6 + 0.5), avg) / 1e6)
    return pd.DataFrame({
        "user_id": [int(g["user_id"].iloc[0])],
        "n_gaps": [len(gaps)],
        "avg_gap_sec": [avg],
        "max_gap_sec": [float(gaps.max()) / 1e6],
    })


def user_gap_stats(events_ds):
    """Per-user inter-event gap statistics — the lag()-window shape:
    (user_id, n_gaps, avg_gap_sec, max_gap_sec); users with a single
    event produce no row.  Per-user groups are small, so the
    partition-by-key + in-group sort idiom (same as sessionize) holds.
    """
    return events_ds.select_columns(["user_id", "ts", "event_id"]) \
        .groupby("user_id").map_groups(_gap_group, batch_format="pandas")


USER_GAP_STATS_SQL = """
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT user_id, count(*) AS n_gaps,
       round(sum(gap_us) / count(*) / 1000000.0, 6) AS avg_gap_sec,
       max(gap_us) / 1000000.0 AS max_gap_sec
FROM d WHERE gap_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def _running_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    # exact integer centi-units: a float cumsum's value depends on
    # DuckDB's segment-tree accumulation order, an int cumsum doesn't
    cents = g["value_cents"].to_numpy("int64")
    return pd.DataFrame({
        "user_id": g["user_id"].to_numpy(),
        "event_id": g["event_id"].to_numpy(),
        "cum_value_cents": cents.cumsum(),
    })


def running_user_totals(events_ds):
    """Per-user running total of event value (the cumulative-window
    shape: SUM OVER PARTITION BY user ORDER BY ts ROWS UNBOUNDED
    PRECEDING), one row per event.  Same partition-by-user idiom as
    sessionize — per-user groups are bounded, the shuffle key is the
    user id, and values are exact integer cents so the result is
    identical under any accumulation order."""
    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.Table.from_arrays(
            [t["user_id"], t["event_id"], t["ts"], cents],
            names=["user_id", "event_id", "ts", "value_cents"])

    return events_ds.select_columns(
        ["user_id", "event_id", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("user_id").map_groups(_running_group,
                                       batch_format="pandas")


RUNNING_USER_TOTALS_SQL = """
SELECT user_id, event_id,
       (sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ))::BIGINT AS cum_value_cents
FROM events
ORDER BY user_id, event_id
"""


# --- event-sequence analytics: transitions, funnels, retention ---

def _transition_group(g: pd.DataFrame) -> pa.Table:
    # Return ARROW: this feeds the (from, to) groupby rollup, and Ray's
    # sort/aggregate over pandas blocks is ~20x slower (CLAUDE.md lesson)
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    et = g["event_type"].to_numpy()
    if len(et) < 2:
        return pa.table({"from_type": pa.array([], pa.string()),
                         "to_type": pa.array([], pa.string()),
                         "n_pairs": pa.array([], pa.int64())})
    pairs = pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]})
    counts = pairs.groupby(["from_type", "to_type"], sort=False) \
        .size().rename("n_pairs").reset_index()
    return pa.Table.from_pandas(counts, preserve_index=False)


def event_transitions(events_ds):
    """Markov transition counts between consecutive events per user —
    the lead()-window shape: (from_type, to_type, n_pairs).

    Scale shape: per-user groups are bounded (same idiom as sessionize);
    each group emits at most |types|² partial-count rows, then ONE tiny
    native groupby rolls them up — the second shuffle carries
    pre-combined counts, never events.
    """
    from ray.data.aggregate import Sum

    return events_ds.select_columns(["user_id", "ts", "event_id",
                                     "event_type"]) \
        .groupby("user_id").map_groups(_transition_group,
                                       batch_format="pandas") \
        .groupby(["from_type", "to_type"]) \
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))


EVENT_TRANSITIONS_SQL = """
WITH nxt AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events)
SELECT from_type, to_type, count(*) AS n_pairs
FROM nxt WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_counts(events_ds, stages: tuple[str, ...] = FUNNEL_STAGES):
    """Ordered-funnel analysis: how many users reached each stage, where
    "reached stage k" means the user's first stage-k event came strictly
    after their first stage-(k-1) event.  Output (stage_idx, stage,
    n_users) with cumulative reach counts.

    Scale shape: conditional first-times via ONE native
    (user, type) Min groupby (pre-combined per block, shuffle carries
    one int per user per stage); the per-user depth walk then runs over
    |stages|-row groups; the final rollup is |stages| rows.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    stages = tuple(stages)
    stage_idx = {s: i for i, s in enumerate(stages)}

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(list(stages), pa.string()))
        t = t.filter(keep)
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.Table.from_arrays(
            [t["user_id"], t["event_type"], us],
            names=["user_id", "event_type", "ts_us"])

    def _depth_group(g: pd.DataFrame) -> pa.Table:
        # Arrow out: feeds the (stage_idx, stage) groupby rollup
        first = dict(zip(g["event_type"], g["first_us"]))
        last = None
        reached = []
        for i, s in enumerate(stages):
            t = first.get(s)
            if t is None or (last is not None and t <= last):
                break
            reached.append((i, s))
            last = t
        return pa.table({
            "stage_idx": pa.array([i for i, _ in reached], pa.int64()),
            "stage": pa.array([s for _, s in reached], pa.string()),
        })

    mins = events_ds.select_columns(["user_id", "event_type", "ts"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["user_id", "event_type"]) \
        .aggregate(Min("ts_us", alias_name="first_us"))
    return mins.groupby("user_id") \
        .map_groups(_depth_group, batch_format="pandas") \
        .groupby(["stage_idx", "stage"]) \
        .aggregate(Count(alias_name="n_users"))


def funnel_counts_sql(stages: tuple[str, ...] = FUNNEL_STAGES) -> str:
    """DuckDB oracle: per-user conditional-min first-times, a CASE
    ladder for ordered depth, and a VALUES join for cumulative reach."""
    stages = tuple(stages)
    mins = ",\n         ".join(
        "min(CASE WHEN event_type = '{s}' THEN epoch_us(ts) END) AS t{i}"
        .format(s=s, i=i) for i, s in enumerate(stages))
    ladder = ["WHEN t0 IS NULL THEN 0"]
    for i in range(1, len(stages)):
        ladder.append(
            f"WHEN t{i} IS NULL OR t{i} <= t{i-1} THEN {i}")
    ladder.append(f"ELSE {len(stages)}")
    vals = ", ".join(f"({i}, '{s}')" for i, s in enumerate(stages))
    return f"""
WITH m AS (
  SELECT user_id,
         {mins}
  FROM events GROUP BY user_id),
d AS (
  SELECT user_id,
         CASE {' '.join(ladder)} END AS depth
  FROM m)
SELECT s.i AS stage_idx, s.name AS stage, count(*) AS n_users
FROM d JOIN (VALUES {vals}) AS s(i, name) ON s.i < d.depth
GROUP BY s.i, s.name
ORDER BY s.i
"""


_US_PER_DAY = 86_400_000_000


def retention_cohorts(events_ds):
    """Retention-cohort analysis: users grouped by first-active day,
    counted per activity-day offset — (cohort_day, day_offset, n_users).
    Day indexes are integer days since the Unix epoch.

    Scale shape: per-batch (user, day) dedup shrinks the exchange to
    distinct activity days; the user-keyed shuffle carries only those;
    the final (cohort, offset) rollup is calendar-bounded (days²), tiny
    at any corpus size.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        # int64 divide truncates; all epochs are positive so trunc==floor
        day = pc.divide(us, pa.scalar(_US_PER_DAY, pa.int64()))
        out = pa.Table.from_arrays(
            [t["user_id"], day],
            names=["user_id", "day_idx"])
        return out.group_by(["user_id", "day_idx"]).aggregate([])

    def _cohort_group(g: pd.DataFrame):
        import numpy as np

        # the batch-level dedup is per-block only; finish it per user.
        # Return ARROW: this feeds the (cohort, offset) groupby, and
        # Ray's sort/aggregate over pandas blocks is ~20x slower.
        days = np.unique(g["day_idx"].to_numpy("int64"))
        cohort = int(days.min())
        return pa.table({
            "cohort_day": pa.array(np.full(len(days), cohort), pa.int64()),
            "day_offset": pa.array(days - cohort, pa.int64()),
        })

    return events_ds.select_columns(["user_id", "ts"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("user_id").map_groups(_cohort_group,
                                       batch_format="pandas") \
        .groupby(["cohort_day", "day_offset"]) \
        .aggregate(Count(alias_name="n_users"))


RETENTION_COHORTS_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day_idx
  FROM events),
c AS (
  SELECT user_id, day_idx,
         min(day_idx) OVER (PARTITION BY user_id) AS cohort_day
  FROM ud)
SELECT cohort_day, day_idx - cohort_day AS day_offset,
       count(*) AS n_users
FROM c GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


_US_PER_HOUR = 3_600_000_000


def cooccurrence_edges(events_ds, cap: int = 200):
    """Co-occurrence edge construction — the log→graph shape: user
    pairs active in the same (event_type, hour) bucket, with shared-
    bucket counts.  Output (user_a, user_b, n_shared), user_a < user_b.

    Scale shape: per-batch (bucket, user) dedup shrinks the exchange to
    distinct memberships; per-bucket pair generation is O(members²) so
    hot buckets are capped (smallest ``cap`` user ids, logged — the
    same guard as the LSH buckets) and the cap is replicated in the
    oracle with a row_number() window; the final edge rollup is one
    native groupby carrying only pair rows.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .dedup import _cap_hot_bucket

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hr = pc.divide(us, pa.scalar(_US_PER_HOUR, pa.int64()))
        out = pa.Table.from_arrays(
            [t["event_type"], hr, t["user_id"]],
            names=["event_type", "hr", "user_id"])
        return out.group_by(["event_type", "hr", "user_id"]).aggregate([])

    # Per-bucket map_groups would pay Ray's per-group overhead on the
    # (huge) number of tiny (type, hour) buckets; instead co-locate
    # whole buckets into a few coarse hash partitions and generate the
    # pairs with a numpy segment sweep inside each.
    num_parts = 64

    def add_part(t: pa.Table) -> pa.Table:
        import zlib

        keys = [f"{e}\x1f{h}" for e, h in
                zip(t["event_type"].to_pylist(), t["hr"].to_pylist())]
        part = pa.array([zlib.crc32(k.encode()) % num_parts for k in keys],
                        pa.int64())
        return t.append_column("part", part)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "hr", "user_id"],
                          kind="mergesort")
        et = g["event_type"].to_numpy()
        hr = g["hr"].to_numpy("int64")
        uid = g["user_id"].to_numpy("int64")
        # bucket segment starts: change in (event_type, hr)
        change = np.ones(len(g), bool)
        if len(g) > 1:
            change[1:] = (et[1:] != et[:-1]) | (hr[1:] != hr[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(g))
        outs = []
        for s0, s1 in zip(starts, ends):
            users = np.unique(uid[s0:s1])
            users = np.asarray(_cap_hot_bucket(list(users), cap,
                                               "cooccurrence"), np.int64)
            if len(users) < 2:
                continue
            ia, ib = np.triu_indices(len(users), k=1)
            # pack the (a, b) pair into ONE int64 shuffle key (user ids
            # < 2^31 — CLAUDE.md lesson: never shuffle on multi-column
            # keys when an int pack exists: measured 17x here) and
            # pre-combine within the partition before the exchange
            outs.append((users[ia] << np.int64(32)) | users[ib])
        # return ARROW, not pandas: Ray's sort/aggregate over pandas
        # blocks is ~20x slower (584 s vs 30 s measured on this rollup)
        if not outs:
            return pa.table({"key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        uk, cnt = np.unique(np.concatenate(outs), return_counts=True)
        return pa.table({"key": pa.array(uk, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(key >> np.int64(32), pa.int64()),
             pa.array(key & np.int64(0xFFFFFFFF), pa.int64()),
             t["n_shared"]],
            names=["user_a", "user_b", "n_shared"])

    from ray.data.aggregate import Sum

    return events_ds.select_columns(["event_type", "ts", "user_id"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(part_pairs, batch_format="pandas") \
        .groupby("key") \
        .aggregate(Sum("cnt", alias_name="n_shared")) \
        .map_batches(finish, batch_format="pyarrow")


def cooccur_cte_body(cap: int = 200, table: str = "events") -> str:
    """The shared CTE chain (buckets → capped members → pair rows) used
    by both the co-occurrence oracle and the PageRank oracle."""
    return f"""ub AS (
  SELECT DISTINCT event_type, epoch_us(ts) // {_US_PER_HOUR} AS hr,
         user_id
  FROM {table}),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY event_type, hr ORDER BY user_id) AS rn
  FROM ub),
c AS (SELECT * FROM r WHERE rn <= {cap}),
p AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b
  FROM c a JOIN c b
    ON a.event_type = b.event_type AND a.hr = b.hr
   AND a.user_id < b.user_id)"""


def cooccurrence_edges_sql(cap: int = 200, table: str = "events") -> str:
    """DuckDB oracle: identical buckets, identical smallest-user-id cap
    via row_number(), identical a<b pair rollup."""
    return f"""
WITH {cooccur_cte_body(cap, table)}
SELECT user_a, user_b, count(*) AS n_shared
FROM p GROUP BY user_a, user_b
ORDER BY user_a, user_b
"""


def windowed_event_dedup(events_ds, window_min: int = 5):
    """Stream-style deduplication: drop an event when the same
    (user_id, event_type) occurred within the previous ``window_min``
    minutes — the at-most-once-per-window gate a clickstream pipeline
    applies before counting.  Returns the surviving events
    (event_id, user_id, event_type, ts).

    Scale shape: partition by (user, type) — bounded groups, same idiom
    as sessionize — sort within the group, and keep rows whose gap to
    the PREVIOUS KEPT row is ≥ the window (a cummax-style scan, exact
    integer microseconds).  Note the kept-row semantics: a burst
    t=0,3,6 min with a 5-min window keeps 0 and 6 (3 suppressed, and a
    suppressed row does NOT extend the window).
    """
    import numpy as np
    import pyarrow as pa

    def _group(g: pd.DataFrame):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        win = window_min * 60_000_000
        keep = np.zeros(len(g), bool)
        last = None
        for i, t in enumerate(us):
            if last is None or t - last >= win:
                keep[i] = True
                last = t
        out = g[keep]
        return pa.table({
            "event_id": pa.array(out["event_id"].to_numpy("int64")),
            "user_id": pa.array(out["user_id"].to_numpy("int64")),
            "event_type": pa.array(out["event_type"].to_numpy(), pa.string()),
            "ts": pa.array(out["ts"].to_numpy().astype("datetime64[us]")),
        })

    return events_ds.select_columns(
        ["event_id", "user_id", "event_type", "ts"]) \
        .groupby(["user_id", "event_type"]) \
        .map_groups(_group, batch_format="pandas")


def windowed_event_dedup_sql(window_min: int = 5,
                             table: str = "events") -> str:
    """DuckDB oracle: kept-row semantics need the last KEPT timestamp,
    not lag() — replayed with a recursive CTE walking each
    (user, type) partition in (ts, event_id) order."""
    win_us = window_min * 60_000_000
    return f"""
WITH RECURSIVE ordered AS (
  SELECT event_id, user_id, event_type, ts,
         epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM {table}),
walk(user_id, event_type, rn, us, event_id, ts, last_kept, keep) AS (
  SELECT user_id, event_type, rn, us, event_id, ts, us, true
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_type, o.rn, o.us, o.event_id, o.ts,
         CASE WHEN o.us - w.last_kept >= {win_us}
              THEN o.us ELSE w.last_kept END,
         o.us - w.last_kept >= {win_us}
  FROM ordered o
  JOIN walk w ON w.user_id = o.user_id
             AND w.event_type = o.event_type AND o.rn = w.rn + 1)
SELECT event_id, user_id, event_type, ts
FROM walk WHERE keep ORDER BY event_id
"""


# --- event-sequence mining: per-user event-type trigram paths --------------

def _trigram_group(g: pd.DataFrame) -> pa.Table:
    # Arrow out: feeds the (t1,t2,t3) rollup groupby
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    et = g["event_type"].to_numpy()
    if len(et) < 3:
        return pa.table({"t1": pa.array([], pa.string()),
                         "t2": pa.array([], pa.string()),
                         "t3": pa.array([], pa.string()),
                         "n_paths": pa.array([], pa.int64())})
    tri = pd.DataFrame({"t1": et[:-2], "t2": et[1:-1], "t3": et[2:]})
    counts = tri.groupby(["t1", "t2", "t3"], sort=False) \
        .size().rename("n_paths").reset_index()
    return pa.Table.from_pandas(counts, preserve_index=False)


def event_path_trigrams(events_ds):
    """Sequence mining: counts of consecutive event-type TRIPLES per
    user, rolled up corpus-wide — (t1, t2, t3, n_paths), the
    double-lead() window shape.

    Scale shape mirrors event_transitions: bounded per-user groups emit
    ≤ |types|³ pre-combined rows; the rollup shuffle carries counts,
    never events."""
    from ray.data.aggregate import Sum

    return events_ds.select_columns(["user_id", "ts", "event_id",
                                     "event_type"]) \
        .groupby("user_id").map_groups(_trigram_group,
                                       batch_format="pandas") \
        .groupby(["t1", "t2", "t3"]) \
        .aggregate(Sum("n_paths", alias_name="n_paths"))


EVENT_PATH_TRIGRAMS_SQL = """
WITH nxt AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, count(*) AS n_paths
FROM nxt WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY t1, t2, t3
"""


# --- session conversion by day-of-week -------------------------------------

_US_PER_DAY_I = 86_400_000_000


def _conversion_group(g: pd.DataFrame) -> pa.Table:
    import numpy as np

    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    gap = g["ts"].diff().dt.total_seconds().div(60)
    sid = (gap.isna() | (gap > SESSION_GAP_MIN)).cumsum()
    conv = g["event_type"].eq("purchase").groupby(sid).any()
    start_us = g["ts"].astype("int64").groupby(sid).min()
    # epoch-day arithmetic on BOTH sides (no engine dow() semantics):
    # (day_idx + 4) % 7 with 0 = Sunday (1970-01-01 was a Thursday).
    # DuckDB's // TRUNCATES toward zero while numpy's floors — mirror
    # trunc explicitly, and canonicalize the modulo to non-negative on
    # both sides so pre-epoch timestamps agree too
    a = start_us.to_numpy()
    tdiv = np.sign(a) * (np.abs(a) // _US_PER_DAY_I)
    dow = ((tdiv + 4) % 7 + 7) % 7
    df = pd.DataFrame({"dow": dow,
                       "conv": conv.to_numpy().astype(np.int64)})
    counts = df.groupby("dow", sort=False).agg(
        n_sessions=("conv", "size"), n_converted=("conv", "sum"))
    return pa.Table.from_pandas(counts.reset_index(), preserve_index=False)


def session_conversion_by_dow(events_ds):
    """30-minute-gap sessions (sessionize semantics) → fraction of
    sessions containing a purchase, per day-of-week of session start:
    (dow, n_sessions, n_converted, conversion_rate).

    Per-user groups are bounded; each emits ≤ 7 pre-combined rows; the
    final rollup is 7 rows."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    agg = events_ds.select_columns(["user_id", "ts", "event_id",
                                    "event_type"]) \
        .groupby("user_id").map_groups(_conversion_group,
                                       batch_format="pandas") \
        .groupby("dow") \
        .aggregate(Sum("n_sessions", alias_name="n_sessions"),
                   Sum("n_converted", alias_name="n_converted"))

    def rate(t: pa.Table) -> pa.Table:
        from .text import _round6

        # _round6, NOT builtin round: Python round is banker's, the
        # oracle's round() is half-away (CLAUDE.md hard rule)
        r = [_round6(c / s) if s else 0.0 for c, s in
             zip(t["n_converted"].to_pylist(), t["n_sessions"].to_pylist())]
        return t.append_column("conversion_rate", pa.array(r, pa.float64()))

    return agg.map_batches(rate, batch_format="pyarrow")


SESSION_CONVERSION_BY_DOW_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS session_id
  FROM marked),
per_session AS (
  SELECT user_id, session_id,
         ((epoch_us(min(ts)) // {_US_PER_DAY_I} + 4) % 7 + 7) % 7 AS dow,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM sessions GROUP BY user_id, session_id)
SELECT dow, count(*) AS n_sessions, sum(conv)::BIGINT AS n_converted,
       round(sum(conv)::DOUBLE / count(*), 6) AS conversion_rate
FROM per_session GROUP BY dow ORDER BY dow
"""


# --- time-decayed user value: exact dyadic half-life weighting -------------

_DECAY_HORIZON_DAYS = 30


def decayed_user_value(events_ds, horizon: int = _DECAY_HORIZON_DAYS):
    """Per-user recency-weighted value: sum of value·2^-(days_ago) with
    a one-day half-life and a ``horizon``-day cutoff, anchored at the
    corpus's max event day — (user_id, decayed_cents_x, decayed_value).

    Exactness trick: 2^-d weights are dyadic, so each event contributes
    the INTEGER cents << (horizon - d); the int64 sum is order-
    independent under any distributed accumulation, and the final
    ``sum / 2^horizon`` rounds identically on both engines.  (Bound:
    cents·2^30 ≈ 1e15/event — int64 holds ~9e3 such events per user;
    beyond that, split the sum by day first.)"""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    days = events_ds.select_columns(["ts"]).map_batches(
        lambda t: pa.table({"day": pc.divide(
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
            pa.scalar(_US_PER_DAY_I, pa.int64()))}),
        batch_format="pyarrow", zero_copy_batch=True)
    ref_day = days.aggregate(Max("day"))["max(day)"]

    def prep(t: pa.Table) -> pa.Table:
        import numpy as np

        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        d = pc.subtract(
            pa.scalar(ref_day, pa.int64()),
            pc.divide(us, pa.scalar(_US_PER_DAY_I, pa.int64()))) \
            .to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        w = np.where((d >= 0) & (d <= horizon),
                     np.int64(1) << np.maximum(horizon - d, 0), 0)
        # enforce the documented exact-int64 bound: cents·2^horizon must
        # stay ≤ 2^62 per event (sum headroom), else the product wraps
        # silently while the DuckDB twin sums into HUGEINT — raise loud
        lim = np.int64(1) << (62 - horizon)
        if np.abs(cents[w > 0]).max(initial=0) > lim:
            raise ValueError(
                "decayed_user_value: |value| exceeds the exact-int64 "
                f"bound (~${float(lim) / 100:.3g} at d=0); split the "
                "sum by day first (see docstring)")
        return pa.table({"user_id": t["user_id"],
                         "wcents": pa.array(cents * w, pa.int64())})

    agg = events_ds.select_columns(["user_id", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("user_id") \
        .aggregate(Sum("wcents", alias_name="decayed_cents_x"))

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        # half-away-from-zero for EITHER sign (decayed cents can go
        # negative on refund rows; _round6 is floor-based and only
        # half-away for non-negative inputs)
        scale = float(1 << horizon) * 100.0
        v = [float(np.copysign(np.floor(abs(x / scale) * 1e6 + 0.5),
                               x) / 1e6)
             for x in t["decayed_cents_x"].to_pylist()]
        return t.append_column("decayed_value", pa.array(v, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def decayed_user_value_sql(horizon: int = _DECAY_HORIZON_DAYS) -> str:
    return f"""
WITH ref AS (
  SELECT max(epoch_us(ts) // {_US_PER_DAY_I}) AS ref_day FROM events),
w AS (
  SELECT user_id,
         CASE WHEN ref.ref_day - epoch_us(ts) // {_US_PER_DAY_I}
                   BETWEEN 0 AND {horizon}
              THEN CAST(round(value * 100) AS BIGINT)
                   * (1::BIGINT << ({horizon} - (ref.ref_day
                        - epoch_us(ts) // {_US_PER_DAY_I})))
              ELSE 0 END AS wcents
  FROM events, ref)
SELECT user_id, sum(wcents)::BIGINT AS decayed_cents_x,
       round(sum(wcents)::DOUBLE / {float((1 << horizon) * 100)}, 6)
         AS decayed_value
FROM w GROUP BY user_id ORDER BY user_id
"""


def purchase_click_window(events_ds, days: int = 7):
    """RANGE JOIN: for every purchase event, how many clicks the same
    user made in the half-open window ``[ts - days, ts)`` — the
    attribution shape (events × events on user + time band).

    Never materializes the pair blow-up: partition by user, then one
    vectorized two-pointer (``np.searchsorted`` of purchase timestamps
    into the user's sorted click timestamps) per group — O(n log n) per
    user vs the O(clicks × purchases) join the SQL oracle runs.  The
    per-user-groups-are-small assumption matches sessionize (module
    docstring); a hot-user skew fix would salt the groupby key and
    merge counts.
    """
    import numpy as np
    import pyarrow.compute as pc

    win_us = days * 86_400_000_000
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "n_recent_clicks": pa.array([], pa.int64())})

    def group(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        is_click = pc.equal(g["event_type"], "click") \
            .to_numpy(zero_copy_only=False)
        is_p = pc.equal(g["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False)
        if not is_p.any():
            return empty
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        cts = np.sort(ts[is_click])
        pts = ts[is_p]
        lo = np.searchsorted(cts, pts - win_us, side="left")
        hi = np.searchsorted(cts, pts, side="left")
        return pa.table({
            "event_id": pa.array(ids[is_p], pa.int64()),
            "user_id": pa.array(g["user_id"].to_numpy(
                zero_copy_only=False)[is_p], pa.int64()),
            "n_recent_clicks": pa.array(hi - lo, pa.int64()),
        })

    return events_ds.select_columns(
        ["user_id", "ts", "event_type", "event_id"]) \
        .groupby("user_id").map_groups(group, batch_format="pyarrow")


def purchase_click_window_sql(days: int = 7) -> str:
    return f"""
        SELECT p.event_id, p.user_id,
               count(c.event_id) AS n_recent_clicks
        FROM events p LEFT JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL {days} DAY AND c.ts < p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id ORDER BY p.event_id
    """


def user_value_trend(events_ds, digits: int = 6):
    """Per-user OLS trend of event value over time —
    (user_id, n_events, slope): least-squares slope of value-cents
    against minutes-since-corpus-start, for users whose events span
    more than one minute (the normal-equation denominator is positive).

    Exactness: x (minutes, rebased on the corpus min via ONE tiny
    aggregate) and y (half-away cents) are ints, so the five partial
    sums (n, Σx, Σy, Σxy, Σx²) are exact int64 under any distributed
    merge order — the classic combiner shape, one native groupby of
    5-int rows per (user, block).  Only the final
    ``(nΣxy − ΣxΣy) / (nΣx² − Σx²)`` is float (two exact-int→double
    casts and one divide — identical IEEE ops in DuckDB).
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min, Sum

    us_per_min = 60_000_000
    mins = events_ds.select_columns(["ts"]).map_batches(
        lambda t: pa.table({"m": pc.divide(
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
            pa.scalar(us_per_min, pa.int64()))}),
        batch_format="pyarrow", zero_copy_batch=True)
    base = mins.aggregate(Min("m"))["min(m)"]

    def prep(t: pa.Table) -> pa.Table:
        x = pc.subtract(
            pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                              pa.int64()),
                      pa.scalar(us_per_min, pa.int64())),
            pa.scalar(base, pa.int64())).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
            "xy": pa.array(x * y, pa.int64()),
            "x2": pa.array(x * x, pa.int64())})

    s = events_ds.select_columns(["user_id", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("user_id").aggregate(
            Count(alias_name="n"), Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"), Sum("xy", alias_name="sxy"),
            Sum("x2", alias_name="sx2"))

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64()),
                      "slope": pa.array([], pa.float64())})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        n = t["n"].to_numpy(zero_copy_only=False)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        sx2 = t["sx2"].to_numpy(zero_copy_only=False)
        den = n * sx2 - sx * sx
        keep = den > 0
        if not keep.any():
            return empty
        num = (n * sxy - sx * sy)[keep].astype(np.float64)
        slope = num / den[keep].astype(np.float64)
        slope = np.where(slope >= 0, np.floor(slope * 10.0 ** digits + 0.5),
                         -np.floor(-slope * 10.0 ** digits + 0.5)) \
            / 10.0 ** digits
        return pa.table({
            "user_id": t["user_id"].filter(pa.array(keep)),
            "n_events": pa.array(n[keep], pa.int64()),
            "slope": pa.array(slope, pa.float64())})

    return s.map_batches(finish, batch_format="pyarrow")


def user_value_trend_sql(digits: int = 6) -> str:
    return f"""
WITH base AS (
  SELECT min(epoch_us(ts) // 60000000) AS m FROM events),
xy AS (
  SELECT user_id,
         epoch_us(ts) // 60000000 - base.m AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events, base),
s AS (
  SELECT user_id, count(*) AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sx2
  FROM xy GROUP BY user_id)
SELECT user_id, n AS n_events,
       round((n * sxy - sx * sy)::DOUBLE
             / (n * sx2 - sx * sx)::DOUBLE, {digits}) AS slope
FROM s WHERE n * sx2 - sx * sx > 0
ORDER BY user_id
"""


def hll_distinct_hopping(events_ds, size_hours: int = 2,
                         hop_hours: int = 1, digits: int = 4):
    """Distinct users per hopping window WITHOUT shuffling user ids —
    the sketch × window composition: each event contributes its HLL
    register update to every window covering it (size/hop copies), the
    exchange carries only (window, register, rank) partials, and one
    native Max-merge finalizes — (window_start, n_registers,
    reg_sum_scaled, est_distinct).

    Exactness contract identical to ``ops/sketch.hll_distinct``: md5-60
    registers, exact dyadic register sum, two-IEEE-op raw estimator.
    At 100 TB this is the shape for "distinct users per sliding hour
    over a year of events" — |windows| × 64 tiny rows total exchange.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    from .sketch import (_ALPHA_64, _HLL_B, _HLL_M, _RANK_BITS,
                         _RANK_MAX)
    from .dedup import _md5_60

    if size_hours % hop_hours:
        raise ValueError("size_hours must be a multiple of hop_hours")
    n_copies = size_hours // hop_hours
    us_size = size_hours * 3_600_000_000
    us_hop = hop_hours * 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        users = t["user_id"].to_pylist()
        reg = np.empty(len(users), np.int64)
        rank = np.empty(len(users), np.int64)
        for j, u in enumerate(users):
            h = _md5_60(str(u).encode())
            reg[j] = h % _HLL_M
            w = h >> _HLL_B
            rank[j] = _RANK_MAX if w == 0 else \
                _RANK_BITS - w.bit_length() + 1
        # window_start of the LAST window covering the event, then the
        # earlier copies at -hop, -2hop, ...
        base = (us // us_hop) * us_hop
        parts = []
        for i in range(n_copies):
            w0 = base - i * us_hop
            parts.append(pd.DataFrame({
                "window_start": w0, "reg": reg, "rank": rank}))
        df = pd.concat(parts, ignore_index=True)
        g = df.groupby(["window_start", "reg"], sort=False)["rank"] \
            .max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    regs = events_ds.select_columns(["user_id", "ts"]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby(["window_start", "reg"]) \
        .aggregate(Max("rank", alias_name="rank"))

    def finish(g: pa.Table) -> pa.Table:
        ranks = dict(zip(g["reg"].to_pylist(), g["rank"].to_pylist()))
        ssum = sum(1 << (_RANK_MAX - int(ranks.get(j, 0)))
                   for j in range(_HLL_M))
        s = ssum / float(1 << _RANK_MAX)
        est = _ALPHA_64 * _HLL_M * _HLL_M / s
        est = np.floor(est * 10.0 ** digits + 0.5) / 10.0 ** digits
        return pa.table({
            "window_start": pa.array([g["window_start"][0].as_py()],
                                     pa.int64()),
            "n_registers": pa.array([_HLL_M], pa.int64()),
            "reg_sum_scaled": pa.array([ssum], pa.int64()),
            "est_distinct": pa.array([float(est)], pa.float64())})

    return regs.groupby("window_start").map_groups(
        finish, batch_format="pyarrow")


def hll_distinct_hopping_sql(size_hours: int = 2, hop_hours: int = 1,
                             digits: int = 4) -> str:
    from .sketch import _ALPHA_64, _HLL_B, _HLL_M, _RANK_BITS, _RANK_MAX

    m, rmax = _HLL_M, _RANK_MAX
    n_copies = size_hours // hop_hours
    us_hop = hop_hours * 3_600_000_000
    return f"""
WITH h AS (
  SELECT (epoch_us(ts) // {us_hop}) * {us_hop}
           - c.i * {us_hop} AS window_start,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM events CROSS JOIN range(0, {n_copies}) AS c(i)),
r AS (
  SELECT window_start, hv % {m} AS reg,
         CASE WHEN hv // {m} = 0 THEN {rmax}
              ELSE {_RANK_BITS} - length(ltrim(bin(hv // {m}), '0')) + 1
         END AS rank
  FROM h),
mx AS (
  SELECT window_start, reg, max(rank) AS rank
  FROM r GROUP BY window_start, reg),
s AS (
  SELECT window_start,
         sum((1::BIGINT << ({rmax} - rank)))::BIGINT
           + ({m} - count(*)) * (1::BIGINT << {rmax}) AS reg_sum_scaled
  FROM mx GROUP BY window_start)
SELECT window_start, {m} AS n_registers, reg_sum_scaled,
       round({_ALPHA_64} * {m} * {m}
             / (reg_sum_scaled / (1::BIGINT << {rmax})::DOUBLE),
             {digits}) AS est_distinct
FROM s ORDER BY window_start
"""


def peak_concurrent_users(events_ds):
    """Peak number of users with an OPEN activity interval per day —
    interval = [first event, last event] of that user's day; the
    classic +1/−1 endpoint sweep (capacity planning / concurrency
    audit).  Returns (day, peak_users).

    Scale shape: ONE native ``groupby((user_id, day))`` min/max builds
    the intervals (corpus → user-day-bounded rows), then a day-bounded
    ``map_groups`` numpy sweep.  Equal instants order starts BEFORE
    ends (lexsort on (ts, −delta)), so instant intervals count and
    touching intervals overlap — the SQL twin's ``ORDER BY ts,
    delta DESC`` replays the same prefix maxima (permutation within an
    equal (ts, delta) run cannot change a run-end cumsum).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                           pa.timestamp("us")),
            "ts": t["ts"]})

    iv = events_ds.select_columns(["user_id", "ts"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["user_id", "day"]).aggregate(
            Min("ts", alias_name="s"), Max("ts", alias_name="e"))

    def sweep(g: pa.Table) -> pa.Table:
        import numpy as np

        s = g["s"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = g["e"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = np.concatenate([s, e])
        delta = np.concatenate([np.ones(len(s), np.int64),
                                -np.ones(len(e), np.int64)])
        order = np.lexsort((-delta, ts))
        peak = int(np.cumsum(delta[order]).max())
        return pa.table({"day": g["day"].slice(0, 1),
                         "peak_users": pa.array([peak], pa.int64())})

    return iv.groupby("day").map_groups(sweep, batch_format="pyarrow")


PEAK_CONCURRENT_USERS_SQL = """
WITH pcu_iv AS (
  SELECT user_id, date_trunc('day', ts) AS day, min(ts) AS s,
         max(ts) AS e
  FROM events GROUP BY 1, 2),
pcu_pts AS (
  SELECT day, s AS ts, 1 AS delta FROM pcu_iv
  UNION ALL SELECT day, e, -1 FROM pcu_iv),
pcu_run AS (
  SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
                               ROWS UNBOUNDED PRECEDING) AS c
  FROM pcu_pts)
SELECT day, max(c)::BIGINT AS peak_users
FROM pcu_run GROUP BY day ORDER BY day
"""


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

def rfm_segments(events_ds, n_bands: int = 5):
    """Recency/Frequency/Monetary segmentation — per user: the three
    raw metrics plus band scores 1..n_bands and the combined ``rfm``
    code.  Bands are EXACT rank quantiles: ``score = 1 +
    (n_bands · |users with strictly smaller metric|) // n_users`` (ties
    share a band — the ``rank() OVER`` twin), so every value is pure
    integer arithmetic and replays in SQL.

    Scale shape: events reduce to one per-user row via a single
    ``groupby(user_id)`` (Max/Count/Sum over int64 epoch-µs and exact
    cents); band boundaries come from per-metric DISTINCT-VALUE
    histograms (bounded by the day span, the max per-user event count
    and the cents value range — corpus-size-independent, the
    value_percentile_ranks precedent) broadcast into one final lookup
    pass.  No global sort, no per-user window.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Max, Sum

    from .ann import _cached_state

    us_per_day = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.Table.from_arrays([t["user_id"], ts_us, cents],
                                    names=["user_id", "ts_us", "cents"])

    per = events_ds.select_columns(["user_id", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("user_id") \
        .aggregate(Max("ts_us", alias_name="last_us"),
                   Count(alias_name="freq"),
                   Sum("cents", alias_name="mon_cents")) \
        .materialize()   # feeds the histograms AND the scoring pass

    gmax = per.max("last_us")

    def decorate(t: pa.Table) -> pa.Table:
        rec = pc.divide(pc.subtract(pa.scalar(gmax, pa.int64()),
                                    t["last_us"]),
                        pa.scalar(us_per_day, pa.int64()))
        return t.append_column("rec_days", pc.cast(rec, pa.int64()))

    per = per.map_batches(decorate, batch_format="pyarrow").materialize()

    # distinct-value histograms → strictly-less cumulative counts
    luts = {}
    n_users = per.count()
    for col in ("rec_days", "freq", "mon_cents"):
        h = per.groupby(col).count().to_pandas() \
            .sort_values(col, kind="mergesort")
        vals = h[col].to_numpy(np.int64)
        n_lt = np.concatenate(
            [[0], h["count()"].to_numpy(np.int64).cumsum()[:-1]])
        luts[col] = (vals, 1 + (n_bands * n_lt) // n_users)
    ref = ray.put(luts)

    def score(t: pa.Table) -> pa.Table:
        import ray as _ray

        m = _cached_state(ref, lambda: _ray.get(ref))
        cols = {"user_id": t["user_id"].to_numpy(zero_copy_only=False)}
        for col, out_name in (("rec_days", "r_score"), ("freq", "f_score"),
                              ("mon_cents", "m_score")):
            vals, bands = m[col]
            v = t[col].to_numpy(zero_copy_only=False)
            cols[col] = v
            cols[out_name] = bands[np.searchsorted(vals, v)]
        rfm = cols["r_score"] * 100 + cols["f_score"] * 10 \
            + cols["m_score"]
        return pa.table({
            "user_id": pa.array(cols["user_id"], pa.int64()),
            "rec_days": pa.array(cols["rec_days"], pa.int64()),
            "freq": pa.array(cols["freq"], pa.int64()),
            "mon_cents": pa.array(cols["mon_cents"], pa.int64()),
            "r_score": pa.array(cols["r_score"], pa.int64()),
            "f_score": pa.array(cols["f_score"], pa.int64()),
            "m_score": pa.array(cols["m_score"], pa.int64()),
            "rfm": pa.array(rfm, pa.int64())})

    return per.map_batches(score, batch_format="pyarrow")


def rfm_segments_sql(n_bands: int = 5, table: str = "events") -> str:
    """Oracle twin: rank()−1 is the strictly-less count, bands via the
    identical integer formula."""
    return f"""
WITH rfm_per AS (
  SELECT user_id,
         (( SELECT max(epoch_us(ts)) FROM {table}) - max(epoch_us(ts)))
           // 86400000000 AS rec_days,
         count(*)::BIGINT AS freq,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS mon_cents
  FROM {table} GROUP BY user_id),
rfm_scored AS (
  SELECT user_id, rec_days, freq, mon_cents,
         1 + ({n_bands} * (rank() OVER (ORDER BY rec_days) - 1))
             // count(*) OVER () AS r_score,
         1 + ({n_bands} * (rank() OVER (ORDER BY freq) - 1))
             // count(*) OVER () AS f_score,
         1 + ({n_bands} * (rank() OVER (ORDER BY mon_cents) - 1))
             // count(*) OVER () AS m_score
  FROM rfm_per)
SELECT user_id, rec_days, freq, mon_cents,
       r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
       m_score::BIGINT AS m_score,
       (r_score * 100 + f_score * 10 + m_score)::BIGINT AS rfm
FROM rfm_scored ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# multi-touch attribution
# ---------------------------------------------------------------------------

_ATTR_H = 20   # dyadic weight horizon: rank ≥ H clicks attribute 0


def click_attribution(events_ds, horizon_min: int = 120):
    """Multi-touch purchase attribution with exact dyadic weights: each
    purchase attributes ``value_cents · 2^(H−1−rank)`` units to every
    click by the same user in the preceding ``horizon_min`` minutes,
    where rank 0 is the most recent click (ties on ts break by
    event_id desc, like the most-recent-first ordering).  Output per
    user: ``(user_id, n_purchases, n_attributed, attr_units)`` — the
    2^k unit scale makes the sum order-independent exact int64
    (the decayed_user_value idiom), so it hash-replays in SQL.

    Scale shape: one ``groupby(user_id)`` shuffle; per group a single
    numpy two-pointer sweep over the user's time-sorted events (no
    clicks×purchases blow-up — each purchase touches only its window
    slice).  Returns ARROW tables from map_groups (the 20× sort
    lesson does not bite: this rollup is terminal).
    """
    import numpy as np
    import pyarrow.compute as pc

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_purchases", pa.int64()),
                            ("n_attributed", pa.int64()),
                            ("attr_units", pa.int64())])

    def per_user(g: pa.Table) -> pa.Table:
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        typ = np.asarray(g["event_type"].to_pylist(), dtype=object)
        cents = np.asarray(
            pc.cast(pc.round(pc.multiply(g["value"], 100.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False))
        # most-recent-first within a purchase's window: sort by ts asc,
        # event_id asc, then walk back from the purchase position
        order = np.lexsort((eid, ts))
        ts, eid, typ, cents = ts[order], eid[order], typ[order], \
            cents[order]
        is_click = typ == "click"
        click_pos = np.nonzero(is_click)[0]
        click_ts = ts[click_pos]
        win = horizon_min * 60_000_000
        total_units = 0
        n_attr = 0
        n_pur = 0
        for p in np.nonzero(typ == "purchase")[0]:
            n_pur += 1
            # clicks strictly before the purchase instant, within win
            hi = int(np.searchsorted(click_ts, ts[p], side="left"))
            lo = int(np.searchsorted(click_ts, ts[p] - win,
                                     side="left"))
            ranks = 0
            for ci in range(hi - 1, lo - 1, -1):   # most recent first
                if ranks >= _ATTR_H:
                    break
                total_units += int(cents[p]) << (_ATTR_H - 1 - ranks)
                ranks += 1
                n_attr += 1
        if n_pur == 0:       # oracle emits purchase-making users only
            return out_schema.empty_table()
        uid = g["user_id"][0].as_py()
        return pa.table({"user_id": pa.array([uid], pa.int64()),
                         "n_purchases": pa.array([n_pur], pa.int64()),
                         "n_attributed": pa.array([n_attr], pa.int64()),
                         "attr_units": pa.array([total_units],
                                                pa.int64())},
                        schema=out_schema)

    return events_ds.select_columns(
        ["user_id", "ts", "event_id", "event_type", "value"]) \
        .groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def click_attribution_sql(horizon_min: int = 120,
                          table: str = "events") -> str:
    """Oracle twin: clicks×purchases range join per user, rank by
    recency, identical dyadic shift arithmetic."""
    return f"""
WITH att_p AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM {table} WHERE event_type = 'purchase'),
att_c AS (
  SELECT user_id, ts, event_id FROM {table}
  WHERE event_type = 'click'),
att_j AS (
  SELECT p.user_id, p.event_id AS pid, p.cents,
         row_number() OVER (
           PARTITION BY p.user_id, p.event_id
           ORDER BY c.ts DESC, c.event_id DESC) - 1 AS rnk
  FROM att_p p JOIN att_c c
    ON c.user_id = p.user_id
   AND c.ts < p.ts
   AND c.ts >= p.ts - INTERVAL {horizon_min} MINUTE),
att_sum AS (
  SELECT user_id,
         count(*) FILTER (WHERE rnk < {_ATTR_H}) AS n_attributed,
         sum(CASE WHEN rnk < {_ATTR_H}
                  THEN cents * (1::BIGINT << ({_ATTR_H} - 1 - rnk))
                  ELSE 0 END)::BIGINT AS attr_units
  FROM att_j GROUP BY user_id),
att_np AS (
  SELECT user_id, count(*)::BIGINT AS n_purchases
  FROM att_p GROUP BY user_id)
SELECT n.user_id, n.n_purchases,
       coalesce(s.n_attributed, 0)::BIGINT AS n_attributed,
       coalesce(s.attr_units, 0)::BIGINT AS attr_units
FROM att_np n LEFT JOIN att_sum s USING (user_id)
ORDER BY n.user_id
"""


# ---------------------------------------------------------------------------
# watermark / late-data audit
# ---------------------------------------------------------------------------

def late_event_audit(events_ds, late_ms: int = 3_600_000,
                     bucket_size: int = 4096):
    """Streaming-ingest watermark audit: treating ``event_id`` order as
    ARRIVAL order, an event is late when its event-time ``ts`` sits
    more than ``late_ms`` behind the watermark (the running max ts over
    all STRICTLY PRIOR arrivals).  Output per event_type:
    ``(event_type, n_events, n_late, max_lateness_ms)`` — the audit
    that sizes allowed-lateness before configuring real event-time
    windows.

    Scale shape: the running max is the token_budget_shards two-phase
    prefix scan transposed to MAX — phase 1 is one per-bucket
    (event_id // bucket_size) max-ts groupby whose result (one int per
    bucket) turns into exclusive prefix maxima on the driver and
    broadcasts; phase 2 finishes each bucket locally (cummax over
    ≤ bucket_size rows).  No global sort, no window shuffle.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Max, Sum

    from .ann import _cached_state

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "bucket": pc.divide(t["event_id"],
                                pa.scalar(bucket_size, pa.int64()))})

    prepped = events_ds.select_columns(["event_id", "event_type", "ts"]) \
        .map_batches(prep, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()

    sums = prepped.groupby("bucket") \
        .aggregate(Max("ts_us", alias_name="mx")).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    mx = sums["mx"].to_numpy(np.int64)
    # exclusive prefix max per bucket (no prior bucket → int64 min)
    excl = np.concatenate([[np.iinfo(np.int64).min],
                           np.maximum.accumulate(mx)[:-1]])
    offs = dict(zip(sums["bucket"].to_numpy(np.int64).tolist(),
                    excl.tolist()))
    off_ref = ray.put(offs)

    def finish(df):
        import ray as _ray

        m = _cached_state(off_ref, lambda: _ray.get(off_ref))
        df = df.sort_values("event_id", kind="mergesort")
        ts = df["ts_us"].to_numpy(np.int64)
        # watermark BEFORE each event: exclusive running max, seeded
        # with the prior buckets' max
        seed = m[int(df["bucket"].iloc[0])]
        run = np.maximum.accumulate(np.concatenate([[seed], ts[:-1]]))
        # the globally-first arrival has no watermark: clamp to its own
        # ts BEFORE subtracting (int64.min − ts would wrap)
        first = run == np.iinfo(np.int64).min
        run[first] = ts[first]
        late = np.maximum(run - ts, 0) // 1000
        out = df[["event_type"]].copy()
        # threshold on the //1000 value — the SQL compares late_ms
        out["is_late"] = (late > late_ms).astype(np.int64)
        out["late_ms"] = late
        return out

    per_event = prepped.groupby("bucket").map_groups(
        finish, batch_format="pandas")
    return per_event.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("is_late", alias_name="n_late"),
        Max("late_ms", alias_name="max_lateness_ms"))


def late_event_audit_sql(late_ms: int = 3_600_000,
                         table: str = "events") -> str:
    """Oracle twin: exclusive running max over arrival order."""
    return f"""
WITH lea AS (
  SELECT event_type,
         greatest(coalesce(
           (epoch_us(max(ts) OVER (ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
            - epoch_us(ts)) // 1000, 0), 0) AS late_ms
  FROM {table})
SELECT event_type, count(*)::BIGINT AS n_events,
       count(*) FILTER (WHERE late_ms > {late_ms})::BIGINT AS n_late,
       max(late_ms)::BIGINT AS max_lateness_ms
FROM lea GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# interval overlap join: user sessions × busy-hour incident windows
# ---------------------------------------------------------------------------

def session_incident_overlap(events_ds, busy_num: int = 12,
                             busy_den: int = 10):
    """Interval overlap join: every user session (30-min-gap
    sessionization, interval = [first event, last event]) against the
    corpus's "incident" hours — tumbling hours whose event count is ≥
    ``busy_num/busy_den`` × the per-hour mean (the exact-integer
    relative-threshold idiom: ``c · n_hours · busy_den ≥ busy_num ·
    total`` — an absolute cut would not survive a scale-factor change).
    Output: ``(user_id, session_start, n_events, n_incidents)`` for
    sessions overlapping ≥1 incident hour.

    Scale shape: the incident side is time-bounded (≤ |hours in the
    corpus| rows — KB at any corpus size), built by one combiner
    groupby and broadcast as a sorted int64 hour-index array; the
    session side streams, and the overlap count per session is two
    ``searchsorted`` probes (an interval [s,e] touches hour h iff
    ``floor(s) ≤ h ≤ floor(e)``) — no all-to-all interval join ever
    happens.
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    _HOUR_US = 3_600_000_000

    def hour_partial(t: pa.Table) -> pa.Table:
        h = pc.floor_temporal(t["ts"], unit="hour")
        vc = pc.value_counts(pc.cast(h, pa.int64()).combine_chunks())
        return pa.table({"h": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    hours = events_ds.select_columns(["ts"]) \
        .map_batches(hour_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("h").aggregate(Sum("n", alias_name="n")).take_all()
    total = sum(int(r["n"]) for r in hours)
    n_hours = len(hours)
    busy = np.sort(np.array(
        [int(r["h"]) // _HOUR_US for r in hours
         if int(r["n"]) * n_hours * busy_den >= busy_num * total],
        np.int64))

    def bounds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds().div(60)
        sid = (gap.isna() | (gap > SESSION_GAP_MIN)).cumsum()
        out = g.groupby(sid).agg(user_id=("user_id", "first"),
                                 session_start=("ts", "min"),
                                 session_end=("ts", "max"),
                                 n_events=("event_id", "count"))
        return out.reset_index(drop=True)

    sess = events_ds.select_columns(["user_id", "ts", "event_id"]) \
        .groupby("user_id").map_groups(bounds, batch_format="pandas")

    def overlap(df: pd.DataFrame) -> pd.DataFrame:
        s = df["session_start"].values.astype("datetime64[us]") \
            .astype(np.int64) // _HOUR_US
        e = df["session_end"].values.astype("datetime64[us]") \
            .astype(np.int64) // _HOUR_US
        n_inc = (np.searchsorted(busy, e, side="right")
                 - np.searchsorted(busy, s, side="left")).astype(np.int64)
        out = df.assign(n_incidents=n_inc)
        out = out[out["n_incidents"] >= 1]
        return out[["user_id", "session_start", "n_events",
                    "n_incidents"]].astype({"n_events": np.int64})

    return sess.map_batches(overlap, batch_format="pandas")


def session_incident_overlap_sql(busy_num: int = 12,
                                 busy_den: int = 10) -> str:
    """Oracle twin: the sessionize CTEs with min/max bounds, an
    integer relative-threshold incident CTE, and an explicit interval
    overlap join."""
    return f"""
WITH si_hours AS (
  SELECT date_trunc('hour', ts) AS h, count(*)::BIGINT AS n
  FROM events GROUP BY 1),
si_tot AS (SELECT sum(n)::BIGINT AS total,
                  count(*)::BIGINT AS n_hours FROM si_hours),
si_inc AS (
  SELECT h FROM si_hours CROSS JOIN si_tot
  WHERE n * n_hours * {busy_den} >= {busy_num} * total),
si_marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
si_sess AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
         count(*)::BIGINT AS n_events
  FROM (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS sid
        FROM si_marked)
  GROUP BY user_id, sid)
SELECT s.user_id, s.session_start, s.n_events,
       count(*)::BIGINT AS n_incidents
FROM si_sess s JOIN si_inc i
  ON i.h >= date_trunc('hour', s.session_start)
 AND i.h <= date_trunc('hour', s.session_end)
GROUP BY s.user_id, s.session_start, s.n_events
ORDER BY s.user_id, s.session_start
"""


# ---------------------------------------------------------------------------
# hourly LOCF resample: per-user time-grid gap fill
# ---------------------------------------------------------------------------

def user_hourly_locf(events_ds):
    """Per-user hourly resample with last-observation-carried-forward:
    a grid of tumbling hours from the user's first to last event hour;
    each grid hour carries the value of the user's latest event at or
    before the hour's end (exact integer cents).  Output rollup:
    ``(user_id, n_hours, sum_locf_cents)`` — the sum proves every
    grid cell without shipping the grid.

    Scale shape: one ``groupby(user_id).map_groups`` — the grid never
    leaves the task (cells = hours spanned, bounded by the corpus time
    range); the fill is a single vectorized ``searchsorted`` of hour
    ends into the user's sorted event times.  Duplicate timestamps
    resolve to the highest event_id (the sort order), matching the
    oracle's ``arg_max(cents, event_id)`` pre-collapse + ASOF join.
    """
    import numpy as np

    _HOUR_US = 3_600_000_000

    def locf(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts_us = g["ts"].values.astype("datetime64[us]") \
            .astype(np.int64)
        v = g["value"].to_numpy() * 100
        cents = np.copysign(np.floor(np.abs(v) + 0.5), v) \
            .astype(np.int64)
        h0, h1 = ts_us[0] // _HOUR_US, ts_us[-1] // _HOUR_US
        probes = (np.arange(h0, h1 + 1, dtype=np.int64) + 1) * _HOUR_US
        idx = np.searchsorted(ts_us, probes, side="left") - 1
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_hours": np.array([h1 - h0 + 1], np.int64),
            "sum_locf_cents": np.array([int(cents[idx].sum())],
                                       np.int64)})

    return events_ds.select_columns(["user_id", "ts", "event_id",
                                     "value"]) \
        .groupby("user_id").map_groups(locf, batch_format="pandas")


USER_HOURLY_LOCF_SQL = """
WITH lo_e AS (
  SELECT user_id, ts,
         arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS cents
  FROM events GROUP BY user_id, ts),
lo_b AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM lo_e GROUP BY user_id),
lo_grid AS (
  SELECT user_id,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
           + INTERVAL 1 HOUR - INTERVAL 1 MICROSECOND AS probe
  FROM lo_b),
lo_fill AS (
  SELECT g.user_id, e.cents
  FROM lo_grid g ASOF JOIN lo_e e
    ON g.user_id = e.user_id AND g.probe >= e.ts)
SELECT user_id, count(*)::BIGINT AS n_hours,
       sum(cents)::BIGINT AS sum_locf_cents
FROM lo_fill GROUP BY user_id ORDER BY user_id
"""


def user_active_time(events_ds, window_min: int = 30):
    """Total ACTIVE time per user — each event opens a
    ``[ts, ts + window_min)`` activity interval; overlapping (or
    touching) intervals merge, and the op reports the merged union:
    ``(user_id, n_intervals, active_us)``.  The engagement-duration
    rollup raw event counts overstate (100 events in one minute ≠ 100
    windows of activity).

    Scale shape: one native ``groupby(user_id)``; each per-user group
    is a vectorized numpy gaps-and-islands pass (sort starts, exclusive
    running-max of ends via shifted ``maximum.accumulate``, island sum
    by ``reduceat``) on exact int64 microseconds — no Python loop, no
    floats, no second exchange.  The twin replays the same islands with
    a window running max.
    """
    import numpy as np

    win_us = window_min * 60 * 1_000_000

    def merge(g: pa.Table) -> pa.Table:
        s = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = np.sort(s)
        e = s + win_us
        # exclusive running max of interval ends
        prev_max = np.empty_like(e)
        prev_max[0] = np.iinfo(np.int64).min
        if len(e) > 1:
            prev_max[1:] = np.maximum.accumulate(e)[:-1]
        new_island = s > prev_max
        starts = np.flatnonzero(new_island)
        island_end = np.maximum.accumulate(e)
        # last index of each island -> its running max end
        last = np.r_[starts[1:] - 1, len(e) - 1]
        active = int((island_end[last] - s[starts]).sum())
        return pa.table({
            "user_id": g["user_id"].slice(0, 1),
            "n_intervals": pa.array([len(starts)], pa.int64()),
            "active_us": pa.array([active], pa.int64()),
        })

    return events_ds.select_columns(["user_id", "ts"]) \
        .groupby("user_id").map_groups(merge, batch_format="pyarrow") \
        .sort("user_id")


def user_active_time_sql(window_min: int = 30,
                         table: str = "events") -> str:
    win_us = window_min * 60 * 1_000_000
    return f"""
WITH uat_iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {win_us} AS e
  FROM {table}),
uat_m AS (
  SELECT user_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY user_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -9223372036854775807) THEN 1 ELSE 0 END AS new_i
  FROM uat_iv),
uat_g AS (
  SELECT *, sum(new_i) OVER (PARTITION BY user_id ORDER BY s
                             ROWS UNBOUNDED PRECEDING) AS island
  FROM uat_m),
uat_isl AS (
  SELECT user_id, island, min(s) AS s0, max(e) AS e1
  FROM uat_g GROUP BY 1, 2)
SELECT user_id, count(*)::BIGINT AS n_intervals,
       sum(e1 - s0)::BIGINT AS active_us
FROM uat_isl GROUP BY user_id ORDER BY user_id
"""


def bot_regularity_audit(events_ds, min_gaps: int = 5,
                         max_mean_gap_us: int = 60_000_000,
                         max_rvar_ppm: int = 10_000):
    """Bot-likeness audit from inter-event timing — per user:
    ``(user_id, n_events, mean_gap_us, rvar_ppm, is_bot)`` where
    rvar_ppm is the exact relative variance of consecutive gaps,
    ``10⁶ · (n·Σg² − (Σg)²) // (Σg)²``, and ``is_bot`` flags users
    with ≥ ``min_gaps`` gaps, machine-fast mean cadence and
    near-constant intervals (human traffic is bursty; schedulers
    aren't).  All arithmetic is Python-bigint / HUGEINT exact — Σg²
    overflows int64 at day-scale gaps, so the per-group reduction
    deliberately leaves numpy for the two scalar sums.

    Scale shape: one native ``groupby(user_id)``; each group reduces
    in-task to a single stats row (gaps from the group's own sorted
    timestamps — no cross-user state, no second exchange).
    """
    def stats(g: pa.Table) -> pa.Table:
        import numpy as np

        us = np.sort(g["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False))
        n = len(us)
        gaps = np.diff(us)
        ng = len(gaps)
        sg = int(gaps.sum())
        sg2 = sum(int(x) * int(x) for x in gaps)   # bigint-exact
        mean_gap = sg // ng if ng else 0
        var2n = ng * sg2 - sg * sg
        rvar = (1_000_000 * var2n) // (sg * sg) if sg > 0 else 0
        is_bot = int(ng >= min_gaps and mean_gap < max_mean_gap_us
                     and rvar < max_rvar_ppm)
        return pa.table({
            "user_id": g["user_id"].slice(0, 1),
            "n_events": pa.array([n], pa.int64()),
            "mean_gap_us": pa.array([mean_gap], pa.int64()),
            "rvar_ppm": pa.array([rvar], pa.int64()),
            "is_bot": pa.array([is_bot], pa.int64()),
        })

    return events_ds.select_columns(["user_id", "ts"]) \
        .groupby("user_id").map_groups(stats, batch_format="pyarrow") \
        .sort("user_id")


def bot_regularity_audit_sql(min_gaps: int = 5,
                             max_mean_gap_us: int = 60_000_000,
                             max_rvar_ppm: int = 10_000,
                             table: str = "events") -> str:
    return f"""
WITH bra_g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
  FROM {table}),
bra_s AS (
  SELECT user_id, count(*)::BIGINT AS n_events,
         count(gap)::BIGINT AS ng,
         coalesce(sum(gap), 0)::HUGEINT AS sg,
         coalesce(sum(gap::HUGEINT * gap), 0)::HUGEINT AS sg2
  FROM bra_g GROUP BY user_id),
bra_r AS (
  SELECT user_id, n_events, ng,
         CASE WHEN ng > 0 THEN (sg // ng)::BIGINT ELSE 0 END
           AS mean_gap_us,
         CASE WHEN sg > 0
              THEN ((1000000 * (ng * sg2 - sg * sg))
                    // (sg * sg))::BIGINT
              ELSE 0 END AS rvar_ppm
  FROM bra_s)
SELECT user_id, n_events, mean_gap_us, rvar_ppm,
       (ng >= {min_gaps} AND mean_gap_us < {max_mean_gap_us}
        AND rvar_ppm < {max_rvar_ppm})::BIGINT AS is_bot
FROM bra_r ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# point-in-time training features (feature backfill for label events)
# ---------------------------------------------------------------------------

def pit_training_features(events_ds):
    """Point-in-time-correct training features: for every *purchase*
    (the label event), features computed ONLY from that user's events
    strictly before the label timestamp — the feature-backfill shape a
    feature store runs when generating a training set (no future
    leakage by construction).

    Output (one row per purchase):
      * ``n_prior_events``            — all-time prior event count
      * ``prior_purchase_cents_30d``  — exact cents of prior purchases
                                        in ``[ts-30d, ts)``
      * ``n_types_7d``                — distinct event types seen in
                                        ``[ts-7d, ts)``
      * ``mins_since_prev``           — whole minutes since the user's
                                        previous event (−1 if first)

    Shape: ONE shuffle (the per-user groupby); inside each group a
    vectorized ``np.searchsorted`` sweep over the user's time-sorted
    arrays — O(n log n) per user vs the O(labels × events) band join
    the SQL twin runs.  All features are exact integers (cents,
    counts, floor-minutes), so the value hash is merge-order-free.
    """
    import numpy as np
    import pyarrow.compute as pc

    d30 = 30 * 86_400_000_000
    d7 = 7 * 86_400_000_000
    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "n_prior_events": pa.array([], pa.int64()),
        "prior_purchase_cents_30d": pa.array([], pa.int64()),
        "n_types_7d": pa.array([], pa.int64()),
        "mins_since_prev": pa.array([], pa.int64()),
    })

    def group(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        et = g["event_type"].take(pa.array(order))
        is_p = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        if not is_p.any():
            return empty
        v = g["value"].to_numpy(zero_copy_only=False)[order] * 100.0
        cents = np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)

        lts = ts[is_p]                        # label timestamps
        # all-time strictly-prior count (ties on ts excluded, matching
        # the twin's e.ts < l.ts)
        n_prior = np.searchsorted(ts, lts, side="left")
        # prior purchase cents in [ts-30d, ts): prefix sums over the
        # purchase-only sorted arrays
        pts = ts[is_p]
        pcum = np.concatenate(([0], np.cumsum(cents[is_p])))
        lo = np.searchsorted(pts, lts - d30, side="left")
        hi = np.searchsorted(pts, lts, side="left")
        p30 = pcum[hi] - pcum[lo]
        # distinct types in [ts-7d, ts): one presence test per type in
        # the group (type cardinality is tiny)
        ntypes = np.zeros(len(lts), np.int64)
        for t in pc.unique(et).to_pylist():
            tts = ts[pc.equal(et, t).to_numpy(zero_copy_only=False)]
            lo7 = np.searchsorted(tts, lts - d7, side="left")
            hi7 = np.searchsorted(tts, lts, side="left")
            ntypes += (hi7 > lo7)
        # minutes since the previous event in (ts, event_id) order
        prev = np.concatenate(([np.int64(-1)], ts[:-1]))
        lbl_pos = np.flatnonzero(is_p)
        mins = np.where(lbl_pos == 0, np.int64(-1),
                        (lts - prev[lbl_pos]) // 60_000_000)
        return pa.table({
            "event_id": pa.array(eid[is_p], pa.int64()),
            "user_id": pa.array(g["user_id"].to_numpy(
                zero_copy_only=False)[order][is_p], pa.int64()),
            "n_prior_events": pa.array(n_prior, pa.int64()),
            "prior_purchase_cents_30d": pa.array(p30, pa.int64()),
            "n_types_7d": pa.array(ntypes, pa.int64()),
            "mins_since_prev": pa.array(mins, pa.int64()),
        })

    return events_ds.select_columns(
        ["user_id", "ts", "event_type", "event_id", "value"]) \
        .groupby("user_id").map_groups(group, batch_format="pyarrow")


def pit_training_features_sql() -> str:
    return """
WITH pit_ord AS (
  SELECT event_id, user_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events),
pit_labels AS (
  SELECT event_id, user_id, ts, prev_ts
  FROM pit_ord WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id,
       count(e.event_id) AS n_prior_events,
       coalesce(sum(CASE WHEN e.event_type = 'purchase'
                          AND e.ts >= l.ts - INTERVAL 30 DAY
                         THEN CAST(round(e.value * 100) AS BIGINT)
                    END), 0)::BIGINT AS prior_purchase_cents_30d,
       count(DISTINCT CASE WHEN e.ts >= l.ts - INTERVAL 7 DAY
                           THEN e.event_type END) AS n_types_7d,
       CASE WHEN l.prev_ts IS NULL THEN -1
            ELSE (epoch_us(l.ts) - epoch_us(l.prev_ts)) // 60000000
       END AS mins_since_prev
FROM pit_labels l LEFT JOIN events e
  ON e.user_id = l.user_id AND e.ts < l.ts
GROUP BY l.event_id, l.user_id, l.ts, l.prev_ts
ORDER BY l.event_id
"""


# ---------------------------------------------------------------------------
# Markov next-event model: train on train-split users, eval on test
# ---------------------------------------------------------------------------

def markov_next_event_accuracy(events_ds):
    """Train/eval a first-order Markov next-event-type predictor with a
    user-level hash split (80/20 via the same Knuth hash as
    ``split_assign``, so no user leaks across sides): the predictor is
    argmax of train transition counts (ties broken by lexicographic
    next-type), scored on the test users' consecutive pairs.

    Output per prev_type seen on BOTH sides:
    (prev_type, n_pairs, n_correct, acc_ppm) — exact integers.

    Scale shape: ONE per-user groupby computes each user's ordered
    consecutive-pair counts and tags them train/test from the pure
    user_id hash (zero extra exchange); a native
    ``groupby(split, prev, nxt).sum`` leaves a |types|²-bounded matrix
    — the only thing the driver sees; argmax + accuracy finish there.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from .sample import _KNUTH, _M32

    cut = int(0.2 * _M32)   # sorted-name cuts: test < 0.2, train rest

    _schema = pa.schema([("split", pa.string()), ("prev", pa.string()),
                         ("nxt", pa.string()), ("cnt", pa.int64())])

    def group(g: pd.DataFrame) -> pa.Table:
        # Arrow out: this feeds a downstream groupby (the 20×
        # pandas-block sort lesson)
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return _schema.empty_table()
        uid = int(g["user_id"].iloc[0])
        split = "test" if (uid * _KNUTH) % _M32 < cut else "train"
        pairs = pd.DataFrame({"prev": et[:-1], "nxt": et[1:]})
        out = pairs.groupby(["prev", "nxt"], sort=False).size() \
            .rename("cnt").reset_index()
        out.insert(0, "split", split)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .cast(_schema)

    mat = events_ds.select_columns(
        ["user_id", "ts", "event_id", "event_type"]) \
        .groupby("user_id").map_groups(group, batch_format="pandas") \
        .groupby(["split", "prev", "nxt"]) \
        .aggregate(Sum("cnt", alias_name="cnt")).take_all()

    train: dict[str, list] = {}
    test: dict[str, dict] = {}
    for r in mat:
        if r["split"] == "train":
            train.setdefault(r["prev"], []).append(
                (-int(r["cnt"]), r["nxt"]))
        else:
            test.setdefault(r["prev"], {})[r["nxt"]] = int(r["cnt"])
    pred = {p: min(v)[1] for p, v in train.items()}

    out = {"prev_type": [], "n_pairs": [], "n_correct": [],
           "acc_ppm": []}
    for p in sorted(set(pred) & set(test)):
        n = sum(test[p].values())
        c = test[p].get(pred[p], 0)
        out["prev_type"].append(p)
        out["n_pairs"].append(n)
        out["n_correct"].append(c)
        out["acc_ppm"].append((1_000_000 * c) // n)
    return pa.table({
        "prev_type": pa.array(out["prev_type"], pa.string()),
        "n_pairs": pa.array(out["n_pairs"], pa.int64()),
        "n_correct": pa.array(out["n_correct"], pa.int64()),
        "acc_ppm": pa.array(out["acc_ppm"], pa.int64()),
    })


def markov_next_event_accuracy_sql() -> str:
    from .sample import _KNUTH, _M32

    cut = int(0.2 * _M32)
    return f"""
WITH mk_o AS (
  SELECT user_id, event_type,
         CASE WHEN (user_id * {_KNUTH}) % {_M32} < {cut}
              THEN 'test' ELSE 'train' END AS split,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
mk_p AS (
  SELECT split, event_type AS prev, nxt FROM mk_o
  WHERE nxt IS NOT NULL),
mk_tr AS (
  SELECT prev, nxt, count(*) AS cnt FROM mk_p
  WHERE split = 'train' GROUP BY prev, nxt),
mk_pred AS (
  SELECT prev, nxt AS pred FROM (
    SELECT prev, nxt, row_number() OVER (
      PARTITION BY prev ORDER BY cnt DESC, nxt) AS rn
    FROM mk_tr) WHERE rn = 1),
mk_te AS (
  SELECT prev, nxt, count(*) AS cnt FROM mk_p
  WHERE split = 'test' GROUP BY prev, nxt),
mk_a AS (
  SELECT t.prev, sum(t.cnt) AS n_pairs,
         coalesce(sum(CASE WHEN t.nxt = pr.pred THEN t.cnt END), 0)
           AS n_correct
  FROM mk_te t JOIN mk_pred pr ON pr.prev = t.prev
  GROUP BY t.prev)
SELECT prev AS prev_type, n_pairs::BIGINT AS n_pairs,
       n_correct::BIGINT AS n_correct,
       ((1000000 * n_correct) // n_pairs)::BIGINT AS acc_ppm
FROM mk_a ORDER BY prev_type
"""


def stickiness_dau_mau(events_ds):
    """Per-calendar-month DAU/MAU stickiness — the engagement ratio
    every growth dashboard tracks: ``(mon, n_active_days, sum_dau,
    mau, stickiness_ppm)`` with
    ``stickiness_ppm = 10⁶·Σ_day DAU(day) // (n_active_days · MAU)``
    (mean daily actives over monthly actives, exact integers; months
    indexed as ``year·12 + month − 1``).

    Scale shape: both inputs are batch-deduped distinct (user, day) /
    (user, mon) rows into native groupbys — the exchanges carry
    per-batch-distinct 16-byte int pairs, and every rollup after that
    is calendar-bounded.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.timestamp("us"))
        day = pc.divide(pc.cast(ts, pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        mon = pc.add(pc.multiply(pc.cast(pc.year(ts), pa.int64()),
                                 pa.scalar(12, pa.int64())),
                     pc.cast(pc.subtract(pc.month(ts), 1), pa.int64()))
        b = pa.table({"user_id": t["user_id"], "day": day, "mon": mon})
        return b.group_by(["user_id", "day", "mon"],
                          use_threads=False).aggregate([]) \
            .select(["user_id", "day", "mon"])

    ud = events_ds.select_columns(["user_id", "ts"]) \
        .map_batches(prep, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()

    dau = ud.groupby(["user_id", "day", "mon"]).aggregate(Count()) \
        .groupby(["day", "mon"]).aggregate(Count(alias_name="dau")) \
        .groupby("mon").aggregate(Sum("dau", alias_name="sum_dau"),
                                  Count(alias_name="n_active_days")) \
        .take_all()
    mau = {r["mon"]: r["mau"] for r in
           ud.groupby(["user_id", "mon"]).aggregate(Count())
           .groupby("mon").aggregate(Count(alias_name="mau"))
           .take_all()}
    mons = sorted(r["mon"] for r in dau)
    by = {r["mon"]: r for r in dau}
    return pa.table({
        "mon": pa.array(mons, pa.int64()),
        "n_active_days": pa.array(
            [int(by[m]["n_active_days"]) for m in mons], pa.int64()),
        "sum_dau": pa.array([int(by[m]["sum_dau"]) for m in mons],
                            pa.int64()),
        "mau": pa.array([int(mau[m]) for m in mons], pa.int64()),
        "stickiness_ppm": pa.array(
            [(1_000_000 * int(by[m]["sum_dau"]))
             // (int(by[m]["n_active_days"]) * int(mau[m]))
             for m in mons], pa.int64()),
    })


def stickiness_dau_mau_sql() -> str:
    return """
WITH st_ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day,
         year(ts) * 12 + month(ts) - 1 AS mon
  FROM events),
st_dau AS (
  SELECT mon, day, count(DISTINCT user_id) AS dau
  FROM st_ud GROUP BY mon, day),
st_m AS (
  SELECT mon, sum(dau) AS sum_dau, count(*) AS n_active_days
  FROM st_dau GROUP BY mon),
st_mau AS (
  SELECT mon, count(DISTINCT user_id) AS mau FROM st_ud GROUP BY mon)
SELECT m.mon, m.n_active_days::BIGINT AS n_active_days,
       m.sum_dau::BIGINT AS sum_dau, u.mau::BIGINT AS mau,
       ((1000000 * m.sum_dau) // (m.n_active_days * u.mau))::BIGINT
         AS stickiness_ppm
FROM st_m m JOIN st_mau u ON u.mon = m.mon ORDER BY m.mon
"""


def peak_user_rate(events_ds, window_min: int = 60, cap: int = 20):
    """Per-user peak request rate over ANY sliding window (not just
    aligned ones): the maximum number of events inside a half-open
    ``window_min``-minute window ending at one of the user's events —
    the rate-limiter / abuse-throttle audit.  Output: (user_id,
    n_events, peak_in_window, over_cap).

    Scale shape: one per-user groupby; inside each group a vectorized
    two-pointer (``searchsorted`` of each event's window start into the
    sorted timestamps) — O(n log n) per user vs the O(n²) band join
    the twin runs.  The sliding maximum equals the maximum over
    event-ENDING windows because any window's count is dominated by
    the one ending at its last contained event.
    """
    import numpy as np

    win_us = window_min * 60_000_000

    def group(g: pd.DataFrame) -> pa.Table:
        us = np.sort(g["ts"].to_numpy().astype("datetime64[us]")
                     .astype(np.int64))
        lo = np.searchsorted(us, us - win_us + 1, side="left")
        peak = int((np.arange(len(us)) - lo + 1).max())
        return pa.table({
            "user_id": pa.array([int(g["user_id"].iloc[0])],
                                pa.int64()),
            "n_events": pa.array([len(us)], pa.int64()),
            "peak_in_window": pa.array([peak], pa.int64()),
            "over_cap": pa.array([int(peak > cap)], pa.int64())})

    return events_ds.select_columns(["user_id", "ts"]) \
        .groupby("user_id").map_groups(group, batch_format="pandas")


def peak_user_rate_sql(window_min: int = 60, cap: int = 20) -> str:
    return f"""
WITH pur_w AS (
  SELECT a.user_id, a.event_id, count(*) AS c
  FROM events a JOIN events b
    ON b.user_id = a.user_id
   AND b.ts > a.ts - INTERVAL {window_min} MINUTE AND b.ts <= a.ts
  GROUP BY a.user_id, a.event_id)
SELECT user_id, count(*) AS n_events,
       max(c)::BIGINT AS peak_in_window,
       (max(c) > {cap})::BIGINT AS over_cap
FROM pur_w GROUP BY user_id ORDER BY user_id
"""


def streaming_emit_audit(events_ds, lateness_min: int = 30,
                         bucket_size: int = 4096):
    """What an event-time streaming engine WOULD have emitted vs the
    batch truth: each event's ARRIVAL time is its event time plus a
    deterministic md5-jitter of up to 2 h (simulated network delay —
    the raw log arrives in perfect event-time order, which would make
    the audit vacuous), the watermark is the exclusive running
    event-time max over arrival order, and a row of tumbling hour
    window ``w`` is ON-TIME if it arrives before the watermark passes
    ``w_end``, LATE-BUT-INCLUDED while the watermark is within
    ``w_end + lateness``, and DROPPED after that — the allowed-lateness
    accounting every streaming job configures.  Output per window:
    (whour, n_on_time, n_late_included, n_dropped, batch_count).

    Scale shape: the late_event_audit prefix-scan skeleton transposed
    to ARRIVAL-hour buckets — one per-bucket max groupby, broadcast
    exclusive prefix maxima, local cummax finish emitting per-bucket
    (window, status) count partials into a window-bounded groupby.  No
    global sort.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Sum

    from .ann import _cached_state

    hr_us = 3_600_000_000
    late_us = lateness_min * 60_000_000

    from .dedup import _md5_60

    def prep(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        ts_us = pc.cast(t["ts"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        jitter = np.array([_md5_60(f"arr{int(i)}".encode()) % 7200
                           for i in ids], np.int64) * 1_000_000
        arrival = ts_us + jitter
        return pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "arrival": pa.array(arrival, pa.int64()),
            "bucket": pa.array(arrival // hr_us, pa.int64())})

    prepped = events_ds.select_columns(["event_id", "ts"]) \
        .map_batches(prep, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()
    if prepped.count() == 0:     # empty stream: schema-drop gotcha
        return pa.table({"whour": pa.array([], pa.int64()),
                         "n_on_time": pa.array([], pa.int64()),
                         "n_late_included": pa.array([], pa.int64()),
                         "n_dropped": pa.array([], pa.int64()),
                         "batch_count": pa.array([], pa.int64())})

    sums = prepped.groupby("bucket") \
        .aggregate(Max("ts_us", alias_name="mx")).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    mx = sums["mx"].to_numpy(np.int64)
    excl = np.concatenate([[np.iinfo(np.int64).min],
                           np.maximum.accumulate(mx)[:-1]])
    offs = dict(zip(sums["bucket"].to_numpy(np.int64).tolist(),
                    excl.tolist()))
    off_ref = ray.put(offs)

    _schema = pa.schema([("whour", pa.int64()), ("on_time", pa.int64()),
                         ("late_inc", pa.int64()),
                         ("dropped", pa.int64())])

    def finish(df: pd.DataFrame) -> pa.Table:
        import ray as _ray

        m = _cached_state(off_ref, lambda: _ray.get(off_ref))
        df = df.sort_values(["arrival", "event_id"], kind="mergesort")
        ts = df["ts_us"].to_numpy(np.int64)
        seed = m[int(df["bucket"].iloc[0])]
        run = np.maximum.accumulate(np.concatenate([[seed], ts[:-1]]))
        first = run == np.iinfo(np.int64).min
        run[first] = ts[first]   # first arrival: watermark = own ts
        whour = ts // hr_us
        wend = (whour + 1) * hr_us
        dropped = run >= wend + late_us
        late_inc = (~dropped) & (run >= wend)
        on_time = ~dropped & ~late_inc
        g = pd.DataFrame({"whour": whour,
                          "on_time": on_time.astype(np.int64),
                          "late_inc": late_inc.astype(np.int64),
                          "dropped": dropped.astype(np.int64)}) \
            .groupby("whour", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .cast(_schema)

    rows = prepped.groupby("bucket").map_groups(
        finish, batch_format="pandas") \
        .groupby("whour").aggregate(
            Sum("on_time", alias_name="n_on_time"),
            Sum("late_inc", alias_name="n_late_included"),
            Sum("dropped", alias_name="n_dropped")).take_all()
    rows.sort(key=lambda r: r["whour"])
    return pa.table({
        "whour": pa.array([int(r["whour"]) for r in rows], pa.int64()),
        "n_on_time": pa.array([int(r["n_on_time"]) for r in rows],
                              pa.int64()),
        "n_late_included": pa.array(
            [int(r["n_late_included"]) for r in rows], pa.int64()),
        "n_dropped": pa.array([int(r["n_dropped"]) for r in rows],
                              pa.int64()),
        "batch_count": pa.array(
            [int(r["n_on_time"]) + int(r["n_late_included"])
             + int(r["n_dropped"]) for r in rows], pa.int64()),
    })


def streaming_emit_audit_sql(lateness_min: int = 30) -> str:
    hr_us = 3_600_000_000
    late_us = lateness_min * 60_000_000
    return f"""
WITH sea_a AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts)
           + (('0x' || substr(md5('arr' || event_id), 1, 15))::BIGINT
              % 7200) * 1000000 AS arrival
  FROM events),
sea AS (
  SELECT ts_us,
         max(ts_us) OVER (ORDER BY arrival, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM sea_a),
sea_s AS (
  SELECT ts_us // {hr_us} AS whour,
         CASE WHEN wm IS NULL THEN 'on_time'
              WHEN wm >= (ts_us // {hr_us} + 1) * {hr_us} + {late_us}
                THEN 'dropped'
              WHEN wm >= (ts_us // {hr_us} + 1) * {hr_us}
                THEN 'late'
              ELSE 'on_time' END AS status
  FROM sea)
SELECT whour,
       sum((status = 'on_time')::BIGINT)::BIGINT AS n_on_time,
       sum((status = 'late')::BIGINT)::BIGINT AS n_late_included,
       sum((status = 'dropped')::BIGINT)::BIGINT AS n_dropped,
       count(*)::BIGINT AS batch_count
FROM sea_s GROUP BY whour ORDER BY whour
"""


def conversion_delay_percentiles(events_ds):
    """Funnel-latency distribution: for every purchase with a prior
    click by the same user, the delay to the MOST RECENT prior click
    (exact floor seconds), rolled into per-purchase-isodow p50/p90
    order statistics under the verified 1-based ``ceil(q·n)``
    quantile_disc rule.  Output: (dow, n_pairs, p50_s, p90_s).

    Scale shape: the as-of backward match is the pit_training_features
    per-user searchsorted sweep (one groupby); the quantile input is a
    (dow, delay_s) COUNT histogram — bounded by the corpus time span
    in seconds × 7, never the corpus — finished on the driver.
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    empty = pa.table({"dow": pa.array([], pa.int64()),
                      "delay_s": pa.array([], pa.int64())})

    def group(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        et = g["event_type"].take(pa.array(order))
        is_p = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        is_c = pc.equal(et, "click").to_numpy(zero_copy_only=False)
        if not is_p.any() or not is_c.any():
            return empty
        cts = ts[is_c]
        pts = ts[is_p]
        idx = np.searchsorted(cts, pts, side="left") - 1
        keep = idx >= 0
        if not keep.any():
            return empty
        delay = (pts[keep] - cts[idx[keep]]) // 1_000_000
        dow = pc.day_of_week(
            pa.array(pts[keep].astype("datetime64[us]")),
            count_from_zero=False, week_start=1)
        return pa.table({"dow": pc.cast(dow, pa.int64()),
                         "delay_s": pa.array(delay, pa.int64())})

    hist = events_ds.select_columns(
        ["user_id", "ts", "event_type", "event_id"]) \
        .groupby("user_id").map_groups(group, batch_format="pyarrow") \
        .groupby(["dow", "delay_s"]) \
        .aggregate(Count(alias_name="n")).take_all()
    per: dict[int, list[tuple[int, int]]] = {}
    for r in hist:
        per.setdefault(int(r["dow"]), []).append(
            (int(r["delay_s"]), int(r["n"])))
    out = {"dow": [], "n_pairs": [], "p50_s": [], "p90_s": []}
    for dow in sorted(per):
        h = sorted(per[dow])
        n = sum(c for _, c in h)
        cum = np.cumsum([c for _, c in h])
        vals = [v for v, _ in h]

        def q_at(rank1):                      # 1-based order statistic
            return vals[int(np.searchsorted(cum, rank1, side="left"))]

        out["dow"].append(dow)
        out["n_pairs"].append(n)
        out["p50_s"].append(q_at((n + 1) // 2))
        out["p90_s"].append(q_at((9 * n + 9) // 10))
    return pa.table({k: pa.array(v, pa.int64())
                     for k, v in out.items()})


def conversion_delay_percentiles_sql() -> str:
    return """
WITH cdp_p AS (
  SELECT p.event_id, p.user_id, p.ts, isodow(p.ts) AS dow,
         max(c.ts) AS last_click
  FROM events p JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click'
   AND c.ts < p.ts
  WHERE p.event_type = 'purchase'
  GROUP BY p.event_id, p.user_id, p.ts),
cdp_d AS (
  SELECT dow,
         (epoch_us(ts) - epoch_us(last_click)) // 1000000 AS delay_s
  FROM cdp_p),
cdp_r AS (
  SELECT dow, delay_s,
         row_number() OVER (PARTITION BY dow ORDER BY delay_s) AS rk,
         count(*) OVER (PARTITION BY dow) AS n
  FROM cdp_d)
SELECT dow::BIGINT AS dow, any_value(n)::BIGINT AS n_pairs,
       max(CASE WHEN rk = (n + 1) // 2 THEN delay_s END)::BIGINT
         AS p50_s,
       max(CASE WHEN rk = (9 * n + 9) // 10 THEN delay_s END)::BIGINT
         AS p90_s
FROM cdp_r GROUP BY dow ORDER BY dow
"""
