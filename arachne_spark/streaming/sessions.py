"""Event sessionization (batch) + custom stateful streaming aggregation
(applyInPandasWithState) — the §2.6 streaming-operator surface beyond the
reference (which has no streaming API; its Rete IS the incremental engine,
covered by streaming/incremental.py).

- ``sessionize``: gap-based sessionization as pure window functions
  (JVM-side, SQL-expressible — the DuckDB oracle computes the identical
  lag/cumsum formulation).
- ``user_running_stats_stream``: per-user running aggregates as a CUSTOM
  STATEFUL operator over ``applyInPandasWithState`` — Arrow-batched state
  (n_events, sum_value) per group key, exactly-once via the streaming
  checkpoint. The per-key state is O(1), so state store size is bounded by
  the user cardinality, not the event volume — the shape that survives
  100 TB of events.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds ``gap_seconds``. Emits one row per session:
    (user_id, session_start, session_end, n_events, sum_value).

    Two window passes over a single hash-partition by user — no UDFs, no
    self-joins; at scale this is one shuffle on the user key."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ts = F.unix_timestamp(F.col(ts_col))
    brk = F.when(ts - F.unix_timestamp(F.lag(ts_col).over(w)) > gap_seconds, 1).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.withColumn("__sess", sess)
        .groupBy(user_col, "__sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .drop("__sess")
    )


_STATS_OUT_SCHEMA = "user_id long, n_events long, sum_value double"
_STATS_STATE_SCHEMA = "n long, s double"


def _running_stats_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)]}
    )


def user_running_stats_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running (n_events, sum_value) with explicit state.
    Each micro-batch updates the group's state and emits the current totals
    (output mode 'update')."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_stats_fn,
        outputStructType=_STATS_OUT_SCHEMA,
        stateStructType=_STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
