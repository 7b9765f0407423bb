"""Generate dist/golden_html_main.parquet — the DuckDB oracle for the
`html_main_content` query.

Rows come from html_fixtures.expected_span_rows(): the HAND-DERIVED spans
of each fixture family (written from the family SPECS, never produced by
the parser/classifier under test), with the running-offset rule applied.

Usage: python tools/gen_golden_html_main.py  (re-run when html_fixtures.py
changes; tests/test_html_main.py guards staleness).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_extract_spark.html_fixtures import expected_span_rows  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "dist" / "golden_html_main.parquet"


def main():
    rows = expected_span_rows(replicas=1)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "pos": pa.array([r[1] for r in rows], pa.int64()),
            "kind": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "media_ref": pa.array([r[4] for r in rows], pa.string()),
            "offset": pa.array([r[5] for r in rows], pa.int64()),
        }
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
