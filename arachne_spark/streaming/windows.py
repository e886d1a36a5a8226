"""Watermarked event-time windowed aggregation (Structured Streaming).

The batch counterpart (same grouping formula) is the CORRECTNESS entry
`events_windowed`; this module is the streaming form: a watermark bounds how
late events may arrive, which in turn bounds the state store (one entry per
open window x event_type) — without it, windowed state grows forever. In
append mode a window's row is emitted exactly once, when the watermark
passes the window end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts_stream(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per-(event-time window, key) counts and value sums over a stream.

    Late events within ``watermark_delay`` still land in their window; later
    ones are dropped (documented at-most-once lateness semantics). State is
    bounded: windows older than watermark - delay are finalized and evicted.
    """
    # group on the full window struct (watermark propagation requires the
    # event-time window column itself in the grouping); project start after
    return (
        events_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration), key_col)
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("ws"), key_col, "n", "sum_value"
        )
    )
