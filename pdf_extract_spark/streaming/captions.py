"""Stateful streaming caption alignment over an interleaved span stream.

The batch operator (operators/interleave.py:media_captions) needs each
document's FULL ordered span list — following-text groups are defined
relative to the next media span, which may not have arrived yet.  On a
stream that is arbitrary stateful processing, not a windowed agg: spans
for a doc are buffered in per-doc state until the event-time watermark
says the doc has gone quiet (no span for ``gap_seconds``), then the
buffered list is sorted by pos, the SAME alignment algorithm runs, and
the (media, caption) pairs are emitted exactly once.

State per doc is its span buffer — bounded by document length, sharded
by doc_id, O(active docs) overall; the same bound the batch operator's
per-doc windows have.  Batch parity is tested: a stream replay of the
synthetic interleaved corpus emits exactly media_captions' rows.

Timestamps: the event-time column must be timestamp (ltz).  A
timestamp_ntz column is REJECTED rather than implicitly cast — an
implicit ntz->ltz conversion reinterprets naive timestamps in the
session zone and silently shifts the watermark cutoff across
deployments (same contract as streaming/dedup.py)."""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from .sessionize import resolve_zone

CAPTION_SCHEMA = (
    "doc_id string, media_ref string, media_pos long, "
    "caption string, caption_words long"
)
STATE_SCHEMA = "buf string, last long"

GAP_SECONDS_DEFAULT = 300


def align_captions(
    spans: "list[tuple[int, str, str, str]]",
    max_words: int = 6,
    min_words: int = 1,
) -> "list[tuple[str, int, str, int]]":
    """(pos, kind, text, media_ref) -> (media_ref, media_pos, caption,
    caption_words): the batch alignment semantics on one document's
    sorted span list — running media counter, up to ``max_words``
    following non-media spans per media; pairs with fewer than
    ``min_words`` caption spans are dropped (default 1, matching
    media_captions' batch default — pass 0 to keep empty-caption
    pairs)."""
    spans = sorted(spans, key=lambda s: s[0])
    media: list[tuple[int, str, int]] = []  # (group, ref, pos)
    caps: dict[int, list[str]] = {}
    g = 0
    for pos, kind, text, ref in spans:
        if kind == "media":
            g += 1
            media.append((g, ref, pos))
        elif g >= 1:
            bucket = caps.setdefault(g, [])
            if len(bucket) < max_words:
                bucket.append(text)
    return [
        (ref, pos, " ".join(caps.get(grp, [])), len(caps.get(grp, [])))
        for grp, ref, pos in media
        if len(caps.get(grp, [])) >= min_words
    ]


def make_caption_aligner(
    gap_seconds: int = GAP_SECONDS_DEFAULT,
    max_words: int = 6,
    min_words: int = 1,
    tz: str = "UTC",
):
    """Returns the applyInPandasWithState function.  State is the JSON
    span buffer plus the last event-time second; emission happens ONLY
    on timeout (documents have no end marker — quiet-for-gap IS the end
    signal), so every doc emits exactly once PER QUIET PERIOD.

    At-least-once caveat (ADVICE r6): the exactly-once contract assumes
    the quiet gap exceeds the doc's real event-time spread.  A span
    arriving after the gap timeout fired (but still ahead of the
    watermark) re-creates state and emits a SECOND caption set for the
    same doc with a fresh media counter — downstream consumers must
    treat (doc_id, media_ref) rows as at-least-once and dedup/merge on
    doc_id (the batch path is unaffected; its input is complete by
    construction).  Retaining an emitted-tombstone per doc_id would
    buy exactly-once at the cost of unbounded state — rejected for the
    same reason the watermark exists."""

    def align(key, pdfs: Iterator[pd.DataFrame], state):
        zone = resolve_zone(tz)
        (doc_id,) = key
        if state.hasTimedOut:
            buf, _last = state.get
            spans = [tuple(s) for s in json.loads(buf)]
            rows = [
                (str(doc_id), ref, int(pos), caption, int(nw))
                for ref, pos, caption, nw in align_captions(
                    spans, max_words, min_words
                )
            ]
            state.remove()
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id",
                        "media_ref",
                        "media_pos",
                        "caption",
                        "caption_words",
                    ],
                )
            return
        spans: list = []
        last = 0
        if state.exists:
            buf, last = state.get
            spans = [tuple(s) for s in json.loads(buf)]
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_utc = pdf["ts"].dt.tz_localize(
                zone, ambiguous=True, nonexistent="shift_forward"
            )
            last = max(last, int(ts_utc.astype("int64").max() // 10**9))
            spans.extend(
                (int(p), str(k), str(t), str(r))
                for p, k, t, r in zip(
                    pdf["pos"], pdf["kind"], pdf["text"], pdf["media_ref"]
                )
            )
        state.update((json.dumps(spans), last))
        state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        return

    return align


def caption_stream(
    spans_stream,
    gap_seconds: int = GAP_SECONDS_DEFAULT,
    max_words: int = 6,
    min_words: int = 1,
    watermark: str = "10 minutes",
):
    """Interleaved span stream (doc_id, pos, kind, text, media_ref, ts)
    -> (media, caption) pair rows, one batch-parity set per quiet doc
    (min_words mirrors media_captions: default 1 drops empty-caption
    pairs, exactly the batch default)."""
    if dict(spans_stream.dtypes).get("ts") == "timestamp_ntz":
        raise TypeError(
            "event-time column 'ts' is timestamp_ntz; convert it to "
            "timestamp (ltz) with an explicit timezone before streaming "
            "caption alignment — an implicit cast would shift the "
            "watermark cutoff with spark.sql.session.timeZone"
        )
    tz = (
        spans_stream.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        or "UTC"
    )
    return (
        spans_stream.withWatermark("ts", watermark)
        .groupBy("doc_id")
        .applyInPandasWithState(
            make_caption_aligner(gap_seconds, max_words, min_words, tz=tz),
            CAPTION_SCHEMA,
            STATE_SCHEMA,
            "append",
            "EventTimeTimeout",
        )
    )
