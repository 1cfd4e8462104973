"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.10) — this module is an
extension: a fitted Workflow's transform is stateless by construction
(all stats frozen at fit time), so it applies verbatim to a streaming
DataFrame; plus event-time windowed aggregation with watermarks and a
stateful sessionizer via ``applyInPandasWithState``.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def transform_stream(workflow, stream_df: DataFrame) -> DataFrame:
    """Apply a FITTED workflow to a streaming DataFrame. Stat-backed ops
    become broadcast joins against frozen vocab/stats tables — legal in
    streaming (stream-static joins). Window-based ops (Lag/RollingAgg)
    are not streamable and raise at plan time via Spark itself."""
    return workflow.transform(stream_df)


def windowed_agg_stream(stream_df: DataFrame, ts_col: str, keys: List[str],
                        window: str = "10 minutes",
                        slide: Optional[str] = None,
                        watermark: str = "30 minutes",
                        aggs: Optional[list] = None) -> DataFrame:
    """Event-time windowed aggregation with late-data watermarking."""
    w = F.window(F.col(ts_col), window, slide) if slide else \
        F.window(F.col(ts_col), window)
    out = (stream_df.withWatermark(ts_col, watermark)
           .groupBy(w.alias("window"), *keys))
    return out.agg(*(aggs or [F.count(F.lit(1)).alias("rows")]))


def sessionize_stream(stream_df: DataFrame, ts_col: str, key: str,
                      gap_seconds: float = 1800.0,
                      watermark: str = "30 minutes") -> DataFrame:
    """Stateful streaming sessionization via applyInPandasWithState:
    per-key session counter carried across micro-batches; a new session
    starts when the gap from the last seen event exceeds ``gap_seconds``
    (same contract as the batch Sessionize op)."""
    import pandas as pd

    out_schema = f"{key} string, session_id long, events long, start timestamp, end timestamp"
    state_schema = "last_ts double, session_id long"

    def fn(key_tuple, pdfs, state):
        last_ts, session_id = state.get() if state.exists else (None, 0)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for t in pdf[ts_col]:
                tsec = t.timestamp()
                if last_ts is not None and tsec - last_ts > gap_seconds:
                    session_id += 1
                last_ts = tsec
                rows.append((key_tuple[0], session_id, tsec))
        state.update((last_ts, session_id))
        if not rows:
            return iter([])
        df = pd.DataFrame(rows, columns=[key, "session_id", "tsec"])
        agg = df.groupby([key, "session_id"]).agg(
            events=("tsec", "size"), start=("tsec", "min"), end=("tsec", "max")
        ).reset_index()
        agg["start"] = pd.to_datetime(agg["start"], unit="s")
        agg["end"] = pd.to_datetime(agg["end"], unit="s")
        return iter([agg])

    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
