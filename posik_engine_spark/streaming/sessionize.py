"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (the 'custom stateful operator' slot of the
pipeline — no built-in Spark operator emits one row per closed session
with arbitrary per-session aggregates).

Semantics: events of a user belong to one session while consecutive
event gaps stay <= gap; a session closes when the event-time watermark
passes last_ts + gap (event-time timeout), emitting
(user_id, session_start, session_end, n_events, sum_value).

Batch oracle: sessionize_batch computes identical sessions with a
window/lag/cumsum dataflow (SURVEY.md guide 'sessionization' pattern) —
the streaming operator matches it exactly for in-watermark-order
arrivals per user (tests/test_sessionize.py).

Known limitation (documented, not hidden): an event arriving LATE
relative to the user's current open session (t < session_start, still
inside the watermark) is merged into that session rather than
re-opening history — the state holds one (start,last,n,sum) tuple, not
the raw event buffer. Exact late-data re-sessionization would buffer
events in state until the watermark passes (GroupState supports array
state + getCurrentWatermarkMs); at pipeline scale the approximation is
the standard trade and the batch dataflow is the exact recompute path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, s double"


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events: streaming DF with (user_id, ts, value) — requires an
    event-time watermark already applied to ``ts``.

    Timezone note: Arrow hands the UDF NAIVE wall-clock timestamps in
    the session timezone, but setTimeoutTimestamp expects TRUE epoch
    millis — the session offset is captured driver-side and applied to
    the timeout (gap arithmetic is differences, where the offset
    cancels). With a non-UTC session timezone an unshifted timeout
    would fire hours early/late.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        vals = rows["value"].astype("float64")
        if state.exists:
            start, last, n, s = state.get
        else:
            start, last, n, s = None, 0, 0, 0.0
        out = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if start is None:
                start, last, n, s = t, t, 1, float(v)
            elif t - last <= gap_us:
                last, n, s = max(last, t), n + 1, s + float(v)
            else:
                out.append((start, last, n, s))
                start, last, n, s = t, t, 1, float(v)
        state.update((start, last, n, s))
        # naive-local -> true epoch for the timeout registration
        last_epoch_ms = (
            pd.Timestamp(last, unit="us").tz_localize(tz).value // 1_000_000
        )
        state.setTimeoutTimestamp(last_epoch_ms + gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "session_start": [pd.Timestamp(a, unit="us") for a, _, _, _ in out],
                    "session_end": [pd.Timestamp(b, unit="us") for _, b, _, _ in out],
                    "n_events": [n_ for _, _, n_, _ in out],
                    "sum_value": [s_ for _, _, _, s_ in out],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch oracle: lag + gap-flag cumsum session ids, then one agg.

    Gap comparison is sub-second exact: timestamps cast to fractional
    epoch seconds (unix_timestamp would TRUNCATE to whole seconds and
    disagree with both the streaming operator's microsecond arithmetic
    and the DuckDB epoch() oracle on gaps within 1 s of the boundary).
    """
    gap_s = gap_minutes * 60
    w = Window.partitionBy("user_id").orderBy("ts")
    # cast via TIMESTAMP (LTZ): TIMESTAMP_NTZ sources cannot cast to
    # double directly; the zone shift cancels in the difference
    ts_sec = F.col("ts").cast("timestamp").cast("double")
    prev_sec = F.lag(ts_sec).over(w)
    flagged = events.withColumn(
        "new_sess",
        (
            F.coalesce(ts_sec - prev_sec, F.lit(None))
            > gap_s
        ).cast("int"),
    ).withColumn(
        "sess_id",
        F.sum(F.coalesce(F.col("new_sess"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).drop("sess_id")
