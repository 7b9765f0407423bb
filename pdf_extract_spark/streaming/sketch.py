"""Streaming windowed approximate-distinct via the portable HLL.

The incremental aggregation groups the stream on (event window,
register index) and keeps max(rho) — a watermarked stateful agg whose
state is BOUNDED at (open windows) x 2^p rows regardless of stream
cardinality, which is the whole point: exact windowed
`count_distinct(user_id)` state grows with the number of distinct users
per window, HLL state does not.

Append mode emits a window's register rows once the watermark closes
it; the sink lands the REGISTER TABLE (the mergeable sketch artifact —
`operators/sketch.py:hll_registers` produces the identical shape in
batch), and `finalize` turns any landed register set into estimates.
Because the registers are the same md5-derived values as the batch
operator's, a closed streaming window's estimate is bit-for-bit equal
to `hll_distinct` run over that window's batch slice.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import hll_finalize, hll_register_exprs


def windowed_distinct_registers(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "user_id",
    key_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Stream -> watermarked per-(window, keys, register) max-rho rows,
    safe for append-mode sinks."""
    j, rho = hll_register_exprs(value_col, p)
    # NTZ event times cast losslessly (watermarks require TIMESTAMP)
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            *[F.col(k) for k in key_cols],
            j.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy(F.window(ts_col, window_duration), *key_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
        .select(
            F.col("window.start").alias("window_start"),
            *key_cols,
            "reg",
            "max_rho",
        )
    )


def finalize_windowed_distinct(
    landed_registers: DataFrame,
    key_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Landed register rows -> per-(window, keys) estimates."""
    return hll_finalize(
        landed_registers, ["window_start", *key_cols], p
    )
