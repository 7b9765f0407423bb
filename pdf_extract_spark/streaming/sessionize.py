"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (the arbitrary-stateful-processing surface of
SURVEY.md §2.10 — gap-based sessions cannot be expressed as a windowed
agg because the window boundary depends on the data).

State per user: the OPEN session (start_ts, last_ts, n_events, sum_value).
A session closes when
  * a later event arrives more than `gap` after the session's last event
    (closed-by-data — exact, batch-parity), or
  * the event-time watermark passes last_ts + gap (closed-by-timeout —
    emits sessions whose user went quiet).

Emitted rows are CLOSED sessions only; the open session stays in state.
At 100 TB the state is O(active users) x 4 scalars — the smallest state
this operator family admits — and Spark shards it by the grouping key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

SESSION_SCHEMA = (
    "user_id long, start_ts timestamp, end_ts timestamp, "
    "n_events long, session_value double"
)
STATE_SCHEMA = "start long, last long, n long, value double"

GAP_SECONDS_DEFAULT = 1800


def resolve_zone(tz: str):
    """spark.sql.session.timeZone -> tzinfo.

    Spark accepts region ids (``America/New_York``), which ZoneInfo
    resolves, but ALSO fixed-offset styles — ``+08:00``, ``-0730``,
    ``GMT+8``, ``UTC+08:00`` — which would raise from ZoneInfo and crash
    the stateful UDF (and with it the stream).  Map offset styles to a
    fixed ``datetime.timezone``; anything unparseable falls back to UTC
    with a warning rather than killing the query."""
    import datetime as dt
    import re
    import warnings
    from zoneinfo import ZoneInfo

    try:
        return ZoneInfo(tz)
    except Exception:
        pass
    m = re.fullmatch(
        r"(?:GMT|UTC)?\s*([+-])(\d{1,2})(?::?(\d{2}))?", tz.strip()
    )
    if m:
        sign = 1 if m.group(1) == "+" else -1
        hours, minutes = int(m.group(2)), int(m.group(3) or 0)
        if hours <= 18 and minutes < 60:
            return dt.timezone(sign * dt.timedelta(hours=hours, minutes=minutes))
    warnings.warn(
        f"unrecognized session timeZone {tz!r}: sessionizer falling back to UTC",
        RuntimeWarning,
        stacklevel=2,
    )
    return dt.timezone.utc


def make_sessionizer(gap_seconds: int = GAP_SECONDS_DEFAULT, tz: str = "UTC"):
    """Returns the applyInPandasWithState function (closure over the gap).

    `tz` must be the session's ``spark.sql.session.timeZone``: Spark hands the
    UDF timezone-NAIVE pandas timestamps rendered in that zone, and
    ``state.setTimeoutTimestamp`` expects TRUE event-time epoch millis — so we
    tz-localize before converting to epoch (otherwise a non-UTC session closes
    quiet-user sessions offset hours early/late).
    """

    def sessionize(key, pdfs: Iterator[pd.DataFrame], state):
        import datetime as dt

        zone = resolve_zone(tz)
        (user_id,) = key
        closed = []

        def emit(start, last, n, value):
            # epoch -> session-zone wall clock, emitted naive (round-trips
            # through Spark's timestamp_ltz rendering unchanged)
            closed.append(
                (
                    user_id,
                    dt.datetime.fromtimestamp(start, zone).replace(tzinfo=None),
                    dt.datetime.fromtimestamp(last, zone).replace(tzinfo=None),
                    int(n),
                    float(value),
                )
            )

        if state.hasTimedOut:
            # user went quiet: close the open session
            start, last, n, value = state.get
            emit(start, last, n, value)
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            # applyInPandasWithState delivers one group as MULTIPLE Arrow
            # chunks with no cross-chunk ordering guarantee — buffer the
            # whole group and sort ONCE, or a >1-chunk key processes events
            # out of time order and splits/merges sessions wrongly.
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
                pdf = pdf.sort_values("ts")
                ts_utc = pdf["ts"].dt.tz_localize(zone, ambiguous=True,
                                                  nonexistent="shift_forward")
                ts = (ts_utc.astype("int64") // 10**9).to_list()
                vals = pdf["value"].to_list()
                # `pending`: a late-event session strictly more than a gap
                # BEFORE the open session's start.  Events sorted ascending,
                # so late events precede in-order ones; a burst of them
                # within a gap of each other is ONE batch-parity session,
                # not per-event singletons.  It can also chain INTO cur:
                # once an event lands within a gap of cur's start, cur's
                # start extends down and pending may now connect.
                pending = None
                for t, v in zip(ts, vals):
                    if cur is None:
                        cur = [t, t, 1, float(v)]
                    elif t - cur[1] > gap_seconds:
                        # after the open session's end: close everything
                        # earlier and start fresh
                        if pending is not None:
                            emit(*pending)
                            pending = None
                        emit(*cur)
                        cur = [t, t, 1, float(v)]
                    elif cur[0] - t > gap_seconds:
                        # late: more than a gap before the open session
                        if pending is None:
                            pending = [t, t, 1, float(v)]
                        elif t - pending[1] > gap_seconds:
                            emit(*pending)
                            pending = [t, t, 1, float(v)]
                        else:
                            pending[1] = t
                            pending[2] += 1
                            pending[3] += float(v)
                    else:
                        # a late-but-in-watermark event can precede the open
                        # session carried in state: extend start backwards
                        cur[0] = min(cur[0], t)
                        cur[1] = max(cur[1], t)
                        cur[2] += 1
                        cur[3] += float(v)
                        if pending is not None and cur[0] - pending[1] <= gap_seconds:
                            # backward extension closed the gap: the late
                            # chain merges into the open session
                            cur[0] = min(cur[0], pending[0])
                            cur[2] += pending[2]
                            cur[3] += pending[3]
                            pending = None
                if pending is not None:
                    # closed within this batch (a later cross-batch bridge
                    # event would be a second backward extension the single
                    # open-session state cannot represent — same bound as
                    # the pre-existing singleton behavior, now per-chain)
                    emit(*pending)
            if cur is not None:
                state.update(tuple(cur))
                # close by timeout once the watermark passes last + gap
                state.setTimeoutTimestamp((cur[1] + gap_seconds) * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "start_ts", "end_ts", "n_events", "session_value"],
            )

    return sessionize


def sessionize_stream(events_stream, gap_seconds: int = GAP_SECONDS_DEFAULT,
                      watermark: str = "2 hours"):
    """events stream (user_id, ts, value, ...) -> closed-session rows."""
    from pyspark.sql import functions as F

    ev = events_stream
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    tz = ev.sparkSession.conf.get("spark.sql.session.timeZone", "UTC") or "UTC"
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds, tz=tz),
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            "EventTimeTimeout",
        )
    )
