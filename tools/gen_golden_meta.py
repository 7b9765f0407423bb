"""Generate dist/golden_metadata.parquet — the DuckDB oracle for the
`doc_metadata` query.

Derived from the fixture DEFINITIONS, not the engine: every fixture is
built by PdfBuilder with a %PDF-1.4 header and no /Info dictionary, so
version == "1.4" and title/author/subject/producer/creator are NULL;
page counts come from fixtures.EXPECTED_PAGES (hand-known per family).

Usage: python tools/gen_golden_meta.py  (re-run when fixtures change;
tests/test_spark_extraction.py guards staleness).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extract_spark.fixtures import EXPECTED_PAGES, corpus  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_metadata.parquet"


def golden_rows(replicas: int = 1) -> dict[str, list]:
    cols = {k: [] for k in
            ("doc_id", "version", "page_count", "title", "author",
             "subject", "producer", "creator", "error")}
    for doc_id, pdf, _expected in corpus(replicas):
        family = doc_id.rsplit("-", 1)[0]
        cols["doc_id"].append(doc_id)
        # version = the header's own literal (%PDF-1.x), not engine output
        assert pdf.startswith(b"%PDF-"), doc_id
        cols["version"].append(pdf[5:8].decode("ascii"))
        cols["page_count"].append(EXPECTED_PAGES.get(family, 1))
        for k in ("title", "author", "subject", "producer", "creator", "error"):
            cols[k].append(None)
    return cols


def main():
    cols = golden_rows()
    table = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "version": pa.array(cols["version"], pa.string()),
            "page_count": pa.array(cols["page_count"], pa.int32()),
            **{
                k: pa.array(cols[k], pa.string())
                for k in ("title", "author", "subject", "producer", "creator", "error")
            },
        }
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
