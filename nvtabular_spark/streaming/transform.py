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
        # GroupState.get is a PROPERTY in pyspark (calling it returns
        # the state tuple, so () then TypeErrors) — only reachable
        # once state EXISTS, i.e. multi-batch runs and checkpoint
        # restarts; caught by the restart-recovery test
        last_ts, session_id = state.get if state.exists else (None, 0)
        rows = []
        for pdf in pdfs:
            pdf = pdf.dropna(subset=[ts_col]).sort_values(ts_col)
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


def lag_rolling_stream(stream_df: DataFrame, key: str, ts_col: str,
                       value_col: str, lags=(1,),
                       window_rows: int = 8,
                       watermark: str = "30 minutes") -> DataFrame:
    """Streaming windowed features (north-rule lag/rolling family) via
    ``applyInPandasWithState``: per-entity state carries the last
    ``max(lags, window_rows)`` values across micro-batches; each event
    emits ``lag_k`` and the strictly-past rolling mean/count over the
    previous ``window_rows`` events — the exact contract of the batch
    ``Lag`` / ``RollingAgg`` ops (frame ends at -1). In-order per-entity
    delivery assumed (rows re-sorted within each micro-batch)."""
    import pandas as pd

    lags = sorted(set(int(k) for k in lags))
    if not lags or lags[0] < 1:
        raise ValueError(
            f"lag_rolling_stream: lags must be a non-empty sequence of "
            f"positive ints, got {list(lags)!r}")
    depth = max(max(lags), window_rows)
    key_t = stream_df.schema[key].dataType.simpleString()
    lag_cols = ", ".join(f"{value_col}_lag_{k} double" for k in lags)
    out_schema = (f"{key} {key_t}, {ts_col} timestamp, "
                  f"{value_col} double, {lag_cols}, "
                  f"{value_col}_rolling_mean_{window_rows} double, "
                  f"{value_col}_rolling_count_{window_rows} long")
    state_schema = "buf array<double>"

    def fn(key_tuple, pdfs, state):
        buf = list(state.get[0]) if state.exists else []  # .get is a property
        rows = []
        for pdf in pdfs:
            pdf = pdf.dropna(subset=[ts_col]).sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                # NULL/NaN values: emitted as-is, excluded from the
                # rolling stats (pandas skipna semantics, matching the
                # batch RollingAgg op)
                missing = v is None or v != v
                rec = [key_tuple[0], ts, None if missing else float(v)]
                for k in lags:
                    rec.append(buf[-k] if len(buf) >= k else None)
                past = [x for x in buf[-window_rows:] if x is not None]
                rec.append(sum(past) / len(past) if past else None)
                rec.append(len(past))
                rows.append(rec)
                buf.append(None if missing else float(v))
                if len(buf) > depth:
                    buf = buf[-depth:]
        state.update((buf,))
        if not rows:
            return iter([])
        cols = ([key, ts_col, value_col]
                + [f"{value_col}_lag_{k}" for k in lags]
                + [f"{value_col}_rolling_mean_{window_rows}",
                   f"{value_col}_rolling_count_{window_rows}"])
        return iter([pd.DataFrame(rows, columns=cols)])

    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def asof_join_stream(left_stream: DataFrame, right_stream: DataFrame,
                     on: str, ts_col: str, value_col: str,
                     left_id_col: str,
                     allow_exact_matches: bool = False,
                     watermark: str = "30 minutes") -> DataFrame:
    """Streaming point-in-time join via ``applyInPandasWithState``: each
    left event is enriched with the latest right ``value_col`` at
    ``t' < t`` (strict default, matching the batch AsOfJoin op).

    Mechanics: both streams are tagged and unioned; per-entity state
    carries (last_right_ts, last_right_value) across micro-batches;
    within a batch, rows are processed in (ts, side) order so equal-ts
    right rows are visible exactly when ``allow_exact_matches`` says so.

    Ordering contract: exact for per-entity in-order delivery (the
    common Kafka-partitioned-by-entity layout); within a micro-batch,
    out-of-order rows are re-sorted, so cross-batch disorder inside the
    watermark may see a right value from its own future — the inherent
    streaming approximation (documented, same as Flink's as-of temporal
    join in processing order)."""
    import pandas as pd

    key_t = left_stream.schema[on].dataType.simpleString()
    id_t = left_stream.schema[left_id_col].dataType.simpleString()
    out_schema = (f"{on} {key_t}, {left_id_col} {id_t}, "
                  f"{ts_col} timestamp, {value_col}_asof double")
    state_schema = "last_ts double, last_val double"

    tag_l = left_stream.withWatermark(ts_col, watermark).select(
        F.col(on).alias("__key__"), F.col(ts_col).alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.col(left_id_col).alias("__id__"),
        F.lit(None).cast("double").alias("__val__"))
    tag_r = right_stream.withWatermark(ts_col, watermark).select(
        F.col(on).alias("__key__"), F.col(ts_col).alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.lit(None).cast(id_t).alias("__id__"),
        F.col(value_col).cast("double").alias("__val__"))
    unioned = tag_l.unionByName(tag_r)

    # at equal ts: exact-match mode processes right (side 0) first so
    # the left row sees it; strict mode processes left (side 1) first
    side_sort_asc = bool(allow_exact_matches)

    def fn(key_tuple, pdfs, state):
        last_ts, last_val = state.get if state.exists else (None, None)  # .get is a property
        out = []
        for pdf in pdfs:
            # NaT timestamps cannot be ordered for an as-of lookup
            pdf = pdf.dropna(subset=["__ts__"]) \
                .sort_values(["__ts__", "__side__"],
                             ascending=[True, side_sort_asc])
            for ts, side, rid, val in zip(pdf["__ts__"], pdf["__side__"],
                                          pdf["__id__"], pdf["__val__"]):
                if side == 0:
                    # skip NULL/NaN right values — the batch AsOfJoin
                    # uses F.last(..., ignorenulls=True), so a NULL
                    # must not clobber the last valid observation
                    if not (val is None or val != val):
                        last_ts, last_val = ts.timestamp(), val
                else:
                    out.append((key_tuple[0], rid, ts, last_val))
        state.update((last_ts, last_val))
        if not out:
            return iter([])
        return iter([pd.DataFrame(
            out, columns=[on, left_id_col, ts_col, f"{value_col}_asof"])])

    return (unioned.groupBy("__key__")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def drop_exact_duplicates_stream(stream_df: DataFrame,
                                 text_col: str = "text",
                                 ts_col: Optional[str] = None,
                                 watermark: str = "1 hour",
                                 normalized: bool = True) -> DataFrame:
    """Streaming exact dedup: one row per normalized-text fingerprint
    (the streaming twin of ``functions.dedup.drop_exact_duplicates``).

    Divergence from batch (documented): batch keeps the MIN-id row of a
    duplicate group; a stream cannot know the future minimum, so the
    FIRST-ARRIVED row is kept. With ``ts_col`` the key state is bounded
    by the watermark (``dropDuplicatesWithinWatermark`` — the 100 TB
    shape: state evicts as event time advances); without it, keys are
    kept forever (only for bounded/test streams)."""
    from ..functions.text import fingerprint
    key = fingerprint(F.col(text_col)) if normalized \
        else F.md5(F.col(text_col))
    keyed = stream_df.withColumn("__dk__", key)
    if ts_col is not None:
        keyed = keyed.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(["__dk__"])
    else:
        keyed = keyed.dropDuplicates(["__dk__"])
    return keyed.drop("__dk__")


def expanding_te_stream(stream_df: DataFrame, key: str, ts_col: str,
                        target_col: str, prior: float,
                        p_smooth: float = 20.0,
                        watermark: str = "30 minutes") -> DataFrame:
    """Streaming double of the batch ``ExpandingTargetEncoding``: each
    event is encoded from the entity's PREVIOUSLY-ARRIVED target values
    only — ``(sum_past + p_smooth*prior) / (count_past + p_smooth)`` —
    then the state (one (count, sum) pair per entity, O(1) regardless
    of history length) absorbs the event. ``prior`` is the fitted
    global mean from the batch fit (the op's ``means[target]``) — the
    production split: fit offline, encode the live stream.

    In-order per-entity delivery assumed (rows re-sorted within each
    micro-batch); equivalence with the batch op's range frame holds
    for timestamps spaced >= gap_seconds apart, the same contract the
    other streaming doubles in this module document. NULL/NaN targets
    are emitted but never enter the state (batch NaN≡missing rule).
    ``p_smooth=0`` on a history-less entity yields NULL (batch
    try_divide contract).

    OUTPUT IS PROJECTED, unlike the batch op: the stateful function's
    fixed schema emits only ``(key, ts_col, target_col, te)`` — any
    other stream columns are dropped, so callers needing their payload
    must re-join on (key, ts) downstream (or carry a composite key).
    The batch ``ExpandingTargetEncoding`` passes payload through."""
    import pandas as pd

    key_t = stream_df.schema[key].dataType.simpleString()
    out_schema = (f"{key} {key_t}, {ts_col} timestamp, "
                  f"{target_col} double, ete double")
    state_schema = "cnt long, s double"

    def fn(key_tuple, pdfs, state):
        cnt, s = (state.get if state.exists else (0, 0.0))
        rows = []
        for pdf in pdfs:
            pdf = pdf.dropna(subset=[ts_col]).sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[target_col]):
                denom = cnt + p_smooth
                ete = ((s + p_smooth * prior) / denom) if denom else None
                missing = v is None or v != v
                rows.append([key_tuple[0], ts,
                             None if missing else float(v), ete])
                if not missing:
                    cnt, s = cnt + 1, s + float(v)
        state.update((cnt, s))
        if not rows:
            return iter([])
        return iter([pd.DataFrame(
            rows, columns=[key, ts_col, target_col, "ete"])])

    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def psi_stream(stream_df: DataFrame, ref: DataFrame, col: str,
               ts_col: str = "ts", window: str = "10 minutes",
               bins: int = 10, alpha: float = 0.5,
               watermark: str = "30 minutes", edges=None) -> DataFrame:
    """Streaming drift monitor: per event-time window, the PSI and JS
    divergence of the live stream's ``col`` distribution against a
    STATIC reference snapshot (the training data) — the production
    alarm wired after :mod:`..functions.drift`'s batch gate passes at
    release time.

    The reference is folded driver-side into ``bins`` smoothed
    probabilities and inlined as literals, so the streaming side is
    ONE windowed aggregation (``bins`` conditional sums — no join, no
    second stateful operator, append-mode safe on any Spark version)
    followed by a stateless projection that evaluates the PSI/JS sums
    over those ``bins`` columns. State per window is O(bins) longs.
    Bin edges are the reference's [min, max] (or explicit ``edges``) —
    identical clamping and Laplace smoothing to the batch
    :func:`~nvtabular_spark.functions.drift.psi`, so a window's
    (psi, js) equals the batch function run on that window's rows.
    """
    import math

    from ..functions.drift import _bin_id, _clean
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    if edges is None:
        row = ref.select(F.min(_clean(col)).alias("lo"),
                         F.max(_clean(col)).alias("hi")).collect()[0]
        if row["lo"] is None:
            raise ValueError(f"reference snapshot has no non-null "
                             f"values in {col!r}")
        lo, hi = float(row["lo"]), float(row["hi"])
    else:
        lo, hi = float(edges[0]), float(edges[1])
    width = ((hi - lo) / bins) or 1.0
    counts = (ref.select(_clean(col).alias("__v__"))
              .where(F.col("__v__").isNotNull())
              .select(_bin_id(F.col("__v__"), lo, width, bins)
                      .alias("bin"))
              .groupBy("bin").count().collect())
    n_ref = [0] * bins
    for r in counts:
        n_ref[int(r["bin"])] = int(r["count"])
    tot_ref = sum(n_ref)
    p_ref = [(n + alpha) / (tot_ref + alpha * bins) for n in n_ref]

    cleaned = (stream_df
               .withColumn("__v__", _clean(col))
               .where(F.col("__v__").isNotNull())
               .withColumn("__bin__",
                           _bin_id(F.col("__v__"), lo, width, bins)))
    aggs = [F.sum(F.when(F.col("__bin__") == i, 1).otherwise(0))
            .cast("long").alias(f"__n{i}__") for i in range(bins)]
    windowed = (cleaned.withWatermark(ts_col, watermark)
                .groupBy(F.window(F.col(ts_col), window).alias("window"))
                .agg(*aggs))
    total = None
    for i in range(bins):
        total = F.col(f"__n{i}__") if total is None \
            else total + F.col(f"__n{i}__")
    a, ab = F.lit(float(alpha)), F.lit(float(alpha * bins))
    psi_terms, js_terms = [], []
    for i in range(bins):
        p_c = (F.col(f"__n{i}__") + a) / (total + ab)
        p_r = F.lit(p_ref[i])
        m = (p_r + p_c) / 2
        psi_terms.append((p_c - p_r) * F.log(p_c / p_r))
        js_terms.append((p_r * F.log(p_r / m)
                         + p_c * F.log(p_c / m)) / 2)
    psi = sum(psi_terms[1:], psi_terms[0])
    js = sum(js_terms[1:], js_terms[0])
    return windowed.select("window", total.alias("n_cur"),
                           psi.alias("psi"), js.alias("js_divergence"))
