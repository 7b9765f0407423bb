"""Streaming corpus quality gate + PII scrub.

The Gopher rule chain and the PII redaction chain are pure, stateless
codegen expressions (functions/text.py), so they apply to a streaming
DataFrame unchanged — no watermark, no state store, exactly the same
bytes-in/bytes-out semantics as the batch pipeline.  This module is the
streaming half of corpus_pipeline's quality/redaction stages: the
ingest-time filter a live crawl runs BEFORE documents ever land, so the
expensive stateful stages (dedup — streaming/dedup.py) only see docs
that would survive anyway.

Deliberately NOT included here: the repetition filter (needs a per-doc
gram aggregation — fine in a stream as it is still per-row work, but it
costs two explodes per doc, so ingest applies the cheap narrow rules and
leaves repetition to the batch compaction pass), and anything
cross-document (dedup, quotas — those need state/watermarks and live in
their own modules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import gopher_keep_expr, pii_redact_expr


def quality_gate_stream(docs: DataFrame, text_col: str = "text",
                        min_stopwords: int = 2,
                        redact_pii: bool = False) -> DataFrame:
    """Apply the Gopher keep predicate (narrow filter) and optionally the
    PII scrub (narrow column rewrite) to a streaming documents frame.
    Works identically on a batch frame — the batch-parity test feeds the
    same rows through both and asserts equal output.

    ``redact_pii`` defaults to False to match ``corpus_pipeline``'s batch
    default: a corpus ingested through this gate and later rebuilt or
    audited through the batch pipeline must produce identical text bytes
    (and therefore identical dedup hashes/fingerprints) with no flags
    passed on either side."""
    out = docs.filter(gopher_keep_expr(text_col, min_stopwords=min_stopwords))
    if redact_pii:
        out = out.withColumn(text_col, pii_redact_expr(F.col(text_col)))
    return out
