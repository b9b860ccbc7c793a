"""Stateful streaming operators: cross-batch dedup and watermarked windows.

Reference analog: the reference's continuous ingestion dedups every insert
against the durable row store (/root/reference/src/search/search_provider.rs:
253-263) and its peers drop late results after a deadline
(/root/reference/src/net/udp_service.rs:300-341). In Structured Streaming
those semantics become:

* ``streaming_dedup``        — keep the FIRST document per identity key
  across ALL micro-batches, state kept by the engine
  (``applyInPandasWithState`` keyed by fingerprint; the per-key state is a
  single "seen" flag + first-seen timestamp, so state size is O(distinct
  keys) and can be TTL'd via the GroupStateTimeout);
* ``windowed_event_counts``  — tumbling event-time windows with a
  watermark: late events beyond the allowed lateness are dropped and the
  window state is reclaimed (the deadline-gather analog, but with exact
  semantics instead of best-effort).

Both are pure building blocks: callers attach sources/sinks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: state schema: have we emitted a row for this key yet
_STATE_SCHEMA = "seen boolean"


def streaming_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    timeout: str = GroupStateTimeout.NoTimeout,
    order_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Exactly-first delivery per key across micro-batches.

    Unlike ``dropDuplicates`` inside ``foreachBatch`` (per-batch only) or
    ``dropDuplicates`` on a stream (requires the key in the watermark
    column set), this keeps an explicit boolean per key in the state
    store, so the SECOND and later arrivals of a key are dropped even when
    they land many batches later. Output schema = input schema.

    The representative row is DETERMINISTIC under replay: within the first
    micro-batch that carries a key, the keeper is the row minimizing
    ``order_cols`` (default: every sortable non-key column in schema
    order), not partition arrival order — so checkpoint recovery replaying
    a batch emits the identical row set.
    """
    out_schema = stream.schema
    if order_cols is None:
        sortable = {
            "string", "long", "int", "short", "byte", "double", "float",
            "boolean", "timestamp", "date", "decimal",
        }
        order_cols = tuple(
            f.name
            for f in stream.schema.fields
            if f.name not in key_cols and f.dataType.typeName() in sortable
        )
    order = list(order_cols)

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch: drop all
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.sort_values(order, kind="stable").iloc[[0]] if order else pdf.iloc[[0]]
            if best is None:
                best = cand
            elif order:
                both = pd.concat([best, cand], ignore_index=True)
                best = both.sort_values(order, kind="stable").iloc[[0]]
        if best is not None:
            state.update((True,))
            yield best

    return stream.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling event-time window counts with late-data handling: events
    older than the watermark are dropped and closed windows' state is
    reclaimed by the engine (scales to unbounded streams — state is
    O(open windows x groups), never O(events)).

    ``value_col`` names the column summed alongside the count; pass
    ``None`` (or a column absent from the stream) to emit counts only."""
    if value_col is not None and value_col not in stream.columns:
        value_col = None
    aggs = [F.count(F.lit(1)).alias("n")]
    out_vals = []
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
        out_vals.append(F.round("sum_value", 4).alias("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n",
            *out_vals,
        )
    )


def streaming_sessions(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Stateful streaming sessionization: gap-based session windows under
    a watermark. A session closes (and is emitted, in append mode) when
    the watermark passes its last event + gap; closed-session state is
    reclaimed, so state is O(open sessions), never O(events) — the
    streaming twin of the batch operator (operators/sessionize.py), with
    identical inclusive-at-gap merge semantics.

    Output schema matches batch ``sessionize`` exactly (wall-clock string
    bounds), so one SQL oracle serves both."""
    from dawnsearch_spark.operators.sessionize import TS_FMT

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *group_cols)
        .agg(
            F.date_format(F.min(ts_col), TS_FMT).alias("session_start"),
            F.date_format(F.max(ts_col), TS_FMT).alias("session_end"),
            F.max(ts_col).alias("_last_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            *group_cols, "session_start", "session_end", "_last_ts",
            "n_events", "sum_value",
        )
    )
