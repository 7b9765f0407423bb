"""Streaming caption alignment on the Spark 4 transformWithState API.

The applyInPandasWithState implementation (streaming/captions.py)
serializes the span buffer into one JSON value per key because the old
API exposes exactly one state tuple.  transformWithStateInPandas
(SPARK-49059, Spark 4.x) gives typed composable state — this variant
keeps the buffer as a native ListState of span rows (appendValue per
batch, no serialization round-trip, state grows by APPEND instead of
read-modify-write) plus a ValueState watermark high-mark, and closes
quiet documents with a registered event-time timer.  Semantics are
identical to the old-API operator — both are batch-parity tested
against operators/interleave.py:media_captions — so the two files are
a same-algorithm comparison of the two stateful surfaces SURVEY §2.10
calls for.

State per doc: its span rows + one long; sharded by doc_id; the timer
registry holds one timer per live doc (re-registered forward as spans
arrive — the previous timer is deleted, not leaked)."""

from __future__ import annotations

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from .captions import CAPTION_SCHEMA, GAP_SECONDS_DEFAULT, align_captions
from .sessionize import resolve_zone

SPAN_STATE_SCHEMA = "pos long, kind string, text string, media_ref string"
LAST_STATE_SCHEMA = "last long"


class CaptionAlignerProcessor(StatefulProcessor):
    """ListState span buffer + event-time timer close (see module
    docstring).  Constructed per (gap, max_words, tz) — the tz must be
    the session timeZone, same contract as make_caption_aligner."""

    def __init__(
        self,
        gap_seconds: int = GAP_SECONDS_DEFAULT,
        max_words: int = 6,
        min_words: int = 1,
        tz: str = "UTC",
    ):
        self.gap_seconds = gap_seconds
        self.max_words = max_words
        self.min_words = min_words
        self.tz = tz

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.spans = handle.getListState("spans", SPAN_STATE_SCHEMA)
        self.last = handle.getValueState("last", LAST_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        zone = resolve_zone(self.tz)
        last = self.last.get()[0] if self.last.exists() else 0
        buf = []
        for pdf in rows:
            if not len(pdf):
                continue
            ts_utc = pdf["ts"].dt.tz_localize(
                zone, ambiguous=True, nonexistent="shift_forward"
            )
            last = max(last, int(ts_utc.astype("int64").max() // 10**9))
            buf.extend(
                (int(p), str(k), str(t), str(r))
                for p, k, t, r in zip(
                    pdf["pos"], pdf["kind"], pdf["text"], pdf["media_ref"]
                )
            )
        if buf:
            self.spans.appendList(buf)
        self.last.update((last,))
        # slide the close-timer forward: drop the stale one, arm the new
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer((last + self.gap_seconds) * 1000)
        return iter([])

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        (doc_id,) = key
        spans = [tuple(r) for r in self.spans.get()]
        self.spans.clear()
        self.last.clear()
        rows = [
            (str(doc_id), ref, int(pos), caption, int(nw))
            for ref, pos, caption, nw in align_captions(
                spans, self.max_words, self.min_words
            )
        ]
        if not rows:
            return iter([])
        return iter(
            [
                pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id",
                        "media_ref",
                        "media_pos",
                        "caption",
                        "caption_words",
                    ],
                )
            ]
        )

    def close(self) -> None:
        pass


def caption_stream_tws(
    spans_stream,
    gap_seconds: int = GAP_SECONDS_DEFAULT,
    max_words: int = 6,
    min_words: int = 1,
    watermark: str = "10 minutes",
):
    """transformWithStateInPandas form of caption_stream — same input
    contract ((doc_id, pos, kind, text, media_ref, ts), ntz rejected),
    same output rows, new-API state."""
    if dict(spans_stream.dtypes).get("ts") == "timestamp_ntz":
        raise TypeError(
            "event-time column 'ts' is timestamp_ntz; convert it to "
            "timestamp (ltz) with an explicit timezone before streaming "
            "caption alignment"
        )
    tz = (
        spans_stream.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        or "UTC"
    )
    return (
        spans_stream.withWatermark("ts", watermark)
        .groupBy("doc_id")
        .transformWithStateInPandas(
            CaptionAlignerProcessor(gap_seconds, max_words, min_words, tz=tz),
            CAPTION_SCHEMA,
            "append",
            "EventTime",
        )
    )


def tws_available() -> bool:
    """transformWithStateInPandas ships its state protocol over
    protobuf; this sandbox has no protobuf wheel (and no network), so
    the stream-level path can only run where `google.protobuf` imports
    — the same honest classpath-probe pattern as the Iceberg sink.
    The processor's own logic stays unit-tested with fake handles."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False
