"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (the 'custom stateful operator' slot of the
pipeline — no built-in Spark operator emits one row per closed session
with arbitrary per-session aggregates).

Semantics: events of a user belong to one session while consecutive
event gaps stay <= gap; a session is emitted once the event-time
watermark guarantees no admissible event can extend or bridge it
(watermark > session_end + gap).

EXACT under out-of-order arrival: the per-user state holds the RAW
buffered events still inside the closable horizon (not a collapsed
(start,last,n,sum) tuple), and every invocation re-sessionizes the
sorted buffer — so a late event that re-opens, extends, or BRIDGES two
buffered sessions lands exactly where the batch dataflow would put it.
State is bounded by the watermark delay x per-user event rate: closed
sessions' events are emitted and dropped from the buffer each round.

Batch oracle: sessionize_batch computes identical sessions with a
window/lag/cumsum dataflow — the streaming operator must match it
exactly on the same delivered-event set (in-order and out-of-order
arrivals; tests/test_sessionize.py).
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
# raw event buffer: naive-local microsecond timestamps + values
STATE_SCHEMA = "ts array<long>, vals array<double>"


def _sessions(ts_us: list[int], vals: list[float], gap_us: int):
    """Split a SORTED event buffer into [(start, end, n, sum)] runs."""
    out = []
    start = last = ts_us[0]
    n, s = 1, float(vals[0])
    for t, v in zip(ts_us[1:], vals[1:]):
        if t - last <= gap_us:
            last, n, s = t, n + 1, s + float(v)
        else:
            out.append((start, last, n, s))
            start, last, n, s = t, t, 1, float(v)
    out.append((start, last, n, s))
    return out


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events: streaming DF with (user_id, ts, value) — requires an
    event-time watermark already applied to ``ts``.

    Timezone note: Arrow hands the UDF NAIVE wall-clock timestamps in
    the session timezone, while the watermark/timeout APIs speak TRUE
    epoch millis — the session timezone is captured driver-side and the
    conversions happen at the two boundaries (gap arithmetic itself is
    differences, where the offset cancels).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")

    def to_epoch_ms(naive_us: int) -> int:
        # DST safety for non-UTC session timezones: a naive wall-clock
        # time in a fold is taken as the earlier (DST) instant, and one
        # in a spring-forward gap shifts forward — deterministic instead
        # of raising Ambiguous/NonExistentTimeError inside the state UDF
        # and killing the streaming query. (session.py pins UTC, where
        # both paths are no-ops.)
        return (
            pd.Timestamp(naive_us, unit="us")
            .tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
            .value
            // 1_000_000
        )

    def wm_to_naive_us(wm_ms: int) -> int:
        return (
            pd.Timestamp(wm_ms, unit="ms", tz="UTC")
            .tz_convert(tz)
            .tz_localize(None)
            .value
            // 1_000
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # merge incoming events into the buffered raw-event state
        if state.exists:
            buf_ts, buf_vals = state.get
            buf_ts, buf_vals = list(buf_ts), list(buf_vals)
        else:
            buf_ts, buf_vals = [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = pdf["ts"].astype("int64") // 1000  # ns -> us
                buf_ts.extend(int(t) for t in ts)
                buf_vals.extend(float(v) for v in pdf["value"])
        if not buf_ts:
            state.remove()
            return
        order = sorted(range(len(buf_ts)), key=buf_ts.__getitem__)
        buf_ts = [buf_ts[i] for i in order]
        buf_vals = [buf_vals[i] for i in order]

        runs = _sessions(buf_ts, buf_vals, gap_us)
        # a session is closed iff no admissible event (t >= watermark)
        # can extend it: end + gap < watermark
        wm_naive_us = wm_to_naive_us(state.getCurrentWatermarkMs())
        closed = [r for r in runs if r[1] + gap_us < wm_naive_us]
        kept = [r for r in runs if not r[1] + gap_us < wm_naive_us]

        if kept:
            # retain ONLY the raw events of still-open sessions
            keep_from = kept[0][0]
            idx = next(i for i, t in enumerate(buf_ts) if t >= keep_from)
            state.update((buf_ts[idx:], buf_vals[idx:]))
            # wake when the earliest open session becomes closable
            state.setTimeoutTimestamp(
                to_epoch_ms(kept[0][1]) + gap_minutes * 60 * 1000 + 1
            )
        else:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(a, unit="us") for a, _, _, _ in closed],
                    "session_end": [pd.Timestamp(b, unit="us") for _, b, _, _ in closed],
                    "n_events": [n for _, _, n, _ in closed],
                    "sum_value": [s for _, _, _, s in closed],
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
