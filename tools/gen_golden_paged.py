"""Generate dist/golden_paged.parquet — the DuckDB oracle for the
`extract_paged_spans` query (doc_id, page_num, n_spans).

Derivation (engine-independent): by-pages semantics run a FRESH device per
page, so a page's span count = len(page_expected_text.split('\n')) — the
same hand-derivation rule as the whole-doc golden spans.  Single-page
families reuse the whole-doc expected text; multi-page families carry
hand-derived per-page texts in fixtures.EXPECTED_PAGE_TEXTS.

Usage: python tools/gen_golden_paged.py (re-run when fixtures change).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extract_spark.fixtures import (  # noqa: E402
    EXPECTED_MEDIA,
    EXPECTED_PAGE_TEXTS,
    corpus,
)

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_paged.parquet"


def golden_rows(replicas: int = 1) -> dict[str, list]:
    cols = {"doc_id": [], "page_num": [], "n_spans": []}
    for doc_id, _pdf, expected in corpus(replicas):
        family = doc_id.rsplit("-", 1)[0]
        page_texts = EXPECTED_PAGE_TEXTS.get(family, [expected])
        # media spans (EXPECTED_MEDIA) are emitted on page 1 of the family
        n_media = len(EXPECTED_MEDIA.get(family, []))
        for page_num, text in enumerate(page_texts, start=1):
            cols["doc_id"].append(doc_id)
            cols["page_num"].append(page_num)
            extra = n_media if page_num == 1 else 0
            cols["n_spans"].append(len(text.split("\n")) + extra)
    return cols


def main():
    cols = golden_rows()
    table = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "page_num": pa.array(cols["page_num"], pa.int32()),
            "n_spans": pa.array(cols["n_spans"], pa.int64()),
        }
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
