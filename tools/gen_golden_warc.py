"""Generate dist/golden_warc.parquet — the DuckDB oracle for the
`warc_records_meta` query.

Expectations are derived from the fixture SPEC (the record list handed
to make_warc) by byte arithmetic — record extents are computed from the
documented WARC framing (header bytes + Content-Length block + CRLF
CRLF), never by running parse_warc — so a parser defect (wrong block
slicing, missed HTTP head, bad truncation recovery) diverges from the
golden.  The truncated-archive expectations (which records survive a
mid-file cut, and which error class the tail yields) are likewise
derived from the spec's byte layout.

Usage: python tools/gen_golden_warc.py  (re-run when the spec changes;
tests/test_warc.py guards engine parity).
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extract_spark.sources.warc import (  # noqa: E402
    TRUNC_RECORD,
    warc_fixture_spec,
)

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_warc.parquet"


def expected_rows():
    spec = warc_fixture_spec()
    rows = []  # (warc_id, rec_index, record_type, target_uri, record_id,
    #            content_type, http_status, byte_len, body_sha256, error)

    def spec_row(warc_id, idx, rec):
        wtype, uri, ctype, body = rec
        rid = hashlib.md5(f"{idx}|{wtype}|{uri}".encode()).hexdigest()
        status = 200 if wtype == "response" else 0
        # response blocks wrap the body in an HTTP head; the parser must
        # return the BODY alone, and the expected Content-Type is the
        # value make_warc embeds in the HTTP head (== the spec's ctype)
        return (
            warc_id, idx, wtype, uri, f"<urn:uuid:{rid}>", ctype,
            status, len(body), hashlib.sha256(body).hexdigest(), "",
        )

    for i, rec in enumerate(spec):
        rows.append(spec_row("warc-full", i, rec))

    # truncated archive: the fixture cuts 10 bytes into record
    # TRUNC_RECORD's content block (warc_fixture_archives) — records
    # before it survive whole, the cut record yields exactly one
    # truncated-block error row, nothing follows
    for i, rec in enumerate(spec[:TRUNC_RECORD]):
        rows.append(spec_row("warc-trunc", i, rec))
    rows.append((
        "warc-trunc", TRUNC_RECORD, "", "", "", "", 0, 0,
        hashlib.sha256(b"").hexdigest(), "truncated block",
    ))
    return rows


def main() -> None:
    rows = expected_rows()
    cols = list(zip(*rows))
    names = ["warc_id", "rec_index", "record_type", "target_uri",
             "record_id", "content_type", "http_status", "byte_len",
             "body_sha256", "error"]
    types = [pa.string(), pa.int64(), pa.string(), pa.string(), pa.string(),
             pa.string(), pa.int64(), pa.int64(), pa.string(), pa.string()]
    tbl = pa.table({n: pa.array(c, t) for n, c, t in zip(names, cols, types)})
    OUT.parent.mkdir(exist_ok=True)
    pq.write_table(tbl, OUT)
    print(f"wrote {OUT}: {len(rows)} rows")


if __name__ == "__main__":
    main()
