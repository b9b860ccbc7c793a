"""Batch sessionization: gap-based event sessions per user.

Groups an event stream into sessions with Spark's native
``session_window`` aggregation (a new session starts when the gap since
the previous event reaches ``gap``): the training-data / clickstream
primitive behind per-session features, and the batch twin of the
engine's watermarked streaming windows (streaming/stateful.py).

Reference analog: none — the reference has no event analytics; this is
part of the beyond-reference pipeline family (the driver's ``events``
table exists for exactly these operators).

Semantics contract (what the SQL oracle recomputes as gaps-and-islands
with lag + running sum): two consecutive events of the same user belong
to one session iff ``next_ts - prev_ts <= gap`` — Spark's session_window
merges INCLUSIVELY at exactly the gap (the next event equal to the
previous event's ts+gap extension still merges; pinned by
tests/test_sessionize_suggest.py). Session
bounds are reported as wall-clock strings of min/max event time, so the
comparison is timezone-free for TIMESTAMP_NTZ inputs.

Scale notes: ``session_window`` is one shuffle on the grouping key
(user_id) followed by an in-partition merge — the same cost shape as any
groupBy; no window-function sort pass over the full table is needed
(the gaps-and-islands formulation the oracle uses would cost a per-user
ORDER BY — fine in DuckDB at gate scale, wasteful at 100 TB, which is
why the Spark side uses the native operator instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) per
    gap-delimited session. Bounds are wall-clock strings (second
    precision) of the first/last event in the session."""
    return (
        events.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.date_format(F.min(ts_col), TS_FMT).alias("session_start"),
            F.date_format(F.max(ts_col), TS_FMT).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(user_col, "session_start", "session_end", "n_events", "sum_value")
    )
