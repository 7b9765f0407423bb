"""Generate dist/golden_spans.parquet — the DuckDB oracle for the
flagship `extract_pdf_spans` query.

Rows are derived from the fixtures' HAND-DERIVED expected text (the same
derivation as sources.raw_docs.golden_spans_df) — never from the engine —
so the driver's side-by-side compare is a real oracle:

    doc_id, pages, decode_failures, pos, kind, text, media_ref, offset

replicas=2 matches the query's fixture_corpus_df(replicas=2).

Usage: python tools/gen_golden_spans.py  (re-run whenever fixtures change;
tests/test_plans.py::test_golden_spans_parquet_current guards staleness).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extract_spark.fixtures import EXPECTED_MEDIA, EXPECTED_PAGES, corpus  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_spans.parquet"


def golden_rows(replicas: int = 2) -> dict[str, list]:
    cols = {k: [] for k in
            ("doc_id", "pages", "decode_failures", "pos", "kind", "text",
             "media_ref", "offset")}
    for doc_id, _pdf, expected in corpus(replicas):
        family = doc_id.rsplit("-", 1)[0]
        pages = EXPECTED_PAGES.get(family, 1)
        media = EXPECTED_MEDIA.get(family, [])
        for pos, name in enumerate(media):
            cols["doc_id"].append(doc_id)
            cols["pages"].append(pages)
            cols["decode_failures"].append(0)
            cols["pos"].append(pos)
            cols["kind"].append("media")
            cols["text"].append("")
            cols["media_ref"].append(name)
            cols["offset"].append(0)
        offset = 0
        for pos, seg in enumerate(expected.split("\n"), start=len(media)):
            cols["doc_id"].append(doc_id)
            cols["pages"].append(pages)
            cols["decode_failures"].append(0)
            cols["pos"].append(pos)
            cols["kind"].append("text" if seg else "para")
            cols["text"].append(seg)
            cols["media_ref"].append("")
            cols["offset"].append(offset)
            offset += len(seg) + 1
    return cols


def main():
    cols = golden_rows()
    table = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "pages": pa.array(cols["pages"], pa.int32()),
            "decode_failures": pa.array(cols["decode_failures"], pa.int32()),
            "pos": pa.array(cols["pos"], pa.int64()),
            "kind": pa.array(cols["kind"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "media_ref": pa.array(cols["media_ref"], pa.string()),
            "offset": pa.array(cols["offset"], pa.int64()),
        }
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
