"""Engine-portable HyperLogLog distinct-count sketch, register level.

Spark's built-in `approx_count_distinct` is a black-box HLL++ whose
estimates no other engine can reproduce; this operator builds the HLL
registers EXPLICITLY from md5 so the whole sketch — register values,
register sum, final estimate — is re-derivable by any md5-capable
engine (the DuckDB oracle reimplements it term-for-term).  That also
makes sketches MERGEABLE across systems: a register table computed by
Spark today can be unioned with one computed elsewhere tomorrow.

Determinism: the register sum is EXACT integer arithmetic —
sum(2^(55-rho)) as BIGINT (rho in [1,53] => terms in [4, 2^54]; with
at least one observed register the total stays < 2^63) — so both
engines agree bit-for-bit before the single final float division.

Scale shape: groupBy(keys, register) max-agg (map-side combined,
fan-in to keys x 2^p rows), then a keys-level agg over <= 2^p rows.
The raw stream shuffles once, already reduced to register partials.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 52-bit hash word after the p index bits; rho in [1, 52+1]
_WBITS = 52
_K = 55  # scaled-power exponent: terms 2^(_K - rho), exact in BIGINT


def _alpha(m: int) -> float:
    # standard HLL bias constants (Flajolet et al. 2007)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_exprs(value_col: str, p: int = 8):
    """The (register index, rho) expressions for one value — the
    building block both the batch operator and the streaming windowed
    aggregation group on."""
    assert 4 <= p <= 12
    assert p % 4 == 0, "p must be a multiple of 4 (hex-nibble register index)"
    hexd = p // 4  # index nibbles
    h = F.md5(F.col(value_col).cast("string"))
    j = F.conv(F.substring(h, 1, hexd), 16, 10).cast("long")
    w = F.conv(F.substring(h, hexd + 1, _WBITS // 4), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(_WBITS + 1)).otherwise(
        F.lit(_WBITS + 1) - F.length(F.bin(w))
    )
    return j, rho


def hll_registers(
    df: DataFrame, key_cols: Sequence[str], value_col: str, p: int = 8
) -> DataFrame:
    """The sketch itself: per-(keys, register) max-rho rows.  This table
    is the mergeable/persistable artifact — union register tables from
    different runs or engines and re-finalize."""
    j, rho = hll_register_exprs(value_col, p)
    keys = list(key_cols)
    return (
        df.select(*keys, j.alias("reg"), rho.alias("rho"))
        .groupBy(*keys, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_finalize(
    regs: DataFrame, key_cols: Sequence[str], p: int = 8
) -> DataFrame:
    """Registers -> per-key estimates (raw harmonic-mean branch + the
    linear-counting small-range correction).

    Accepts MERGED input: register tables unioned from several runs may
    carry multiple rows per (keys, reg), so the max-rho is re-reduced
    first — without this, a union would double-count registers and
    drive the empty-register term negative."""
    m = 1 << p
    keys = list(key_cols)
    regs = regs.groupBy(*keys, "reg").agg(F.max("max_rho").alias("max_rho"))
    per_key = regs.groupBy(*keys).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_K} - max_rho)"))
        .alias("__s_present"),
        F.count("*").alias("__n_present"),
    )
    v = F.lit(m) - F.col("__n_present")  # empty registers
    s = F.col("__s_present") + v * F.lit(1 << _K)
    e_raw = (
        F.lit(_alpha(m) * m * m) * F.lit(float(1 << _K)) / s.cast("double")
    )
    estimate = F.when(
        (e_raw <= 2.5 * m) & (v > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))),
    ).otherwise(F.round(e_raw))
    return per_key.select(
        *keys, estimate.cast("long").alias("approx_distinct")
    )


def hll_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Approximate count-distinct of `value_col` per `key_cols` group
    via an explicit md5 HLL sketch with 2^p registers (p=8 -> ~6.5%
    standard error).  Includes the small-range linear-counting
    correction (E <= 2.5m with empty registers)."""
    return hll_finalize(hll_registers(df, key_cols, value_col, p), key_cols, p)


def hll_oracle_sql(
    table: str, key_cols: Sequence[str], value_col: str, p: int = 8
) -> str:
    """The DuckDB SQL re-derivation of hll_distinct — same registers,
    same exact integer register sum, same correction branch."""
    assert p % 4 == 0
    m = 1 << p
    hexd = p // 4
    keys = ", ".join(key_cols)
    alpha = _alpha(m)
    return f"""
WITH hashed AS (
  SELECT {keys},
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, {hexd}))::BIGINT AS j,
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), {hexd + 1}, {_WBITS // 4}))::BIGINT AS w
  FROM {table}
),
regs AS (
  SELECT {keys}, j,
         max(CASE WHEN w = 0 THEN {_WBITS + 1}
                  ELSE {_WBITS + 1} - length(bin(w)) END) AS mrho
  FROM hashed GROUP BY {keys}, j
),
per_key AS (
  SELECT {keys},
         sum((1::BIGINT) << ({_K} - mrho)) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY {keys}
)
SELECT {keys},
       CAST(CASE
         WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m}) * {float(1 << _K)!r}
              / CAST(s_present + ({m} - n_present) * (1::BIGINT << {_K}) AS DOUBLE)
              <= 2.5 * {m} AND ({m} - n_present) > 0
         THEN round(CAST({float(m)!r} AS DOUBLE)
                    * ln(CAST({float(m)!r} AS DOUBLE)
                         / CAST({m} - n_present AS DOUBLE)))
         ELSE round((CAST({alpha!r} AS DOUBLE) * {m} * {m}) * {float(1 << _K)!r}
              / CAST(s_present + ({m} - n_present) * (1::BIGINT << {_K}) AS DOUBLE))
       END AS BIGINT) AS approx_distinct
FROM per_key
"""


def count_min_freq(
    df: DataFrame,
    value_col: str,
    probes: Sequence[str],
    d: int = 4,
    w: int = 1 << 12,
) -> DataFrame:
    """Engine-portable count-min sketch: estimated occurrence counts for
    `probes` over `value_col`, never under the true count.

    The d x w counter table is built distributed — one explode to
    (row, col) cells, one map-side-combined groupBy — with positions
    from the same Kirsch-Mitzenmacher md5 double hashing the Bloom
    filter uses (row i probes col (h1 + i*h2) mod w), so any md5-capable
    engine reproduces every counter exactly (pure integer arithmetic,
    no float anywhere).  The probe set joins against d counter cells and
    takes the min — `est >= true`, with overestimates only from hash
    collisions (eps ~ e/w, delta ~ e^-d).

    Scale shape: the raw stream shuffles once, already reduced to
    (row, col) partials; the sketch is d*w rows regardless of input
    size and the probe lookup is a broadcast join against <= d*|probes|
    cells."""
    assert d >= 1 and w >= 2
    h = F.md5(F.col(value_col).cast("string"))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    # d is a Python int, so the (row, col) structs unroll to a plain
    # codegen array literal — no interpreted HOF lambda on the hot path
    cells = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).cast("int").alias("r"),
                            ((h1 + i * h2) % w).cast("int").alias("c"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("rc")
        )
        .groupBy("rc.r", "rc.c")
        .agg(F.count("*").alias("cnt"))
    )
    probe_rows = []
    import hashlib

    for p in probes:
        hh = hashlib.md5(str(p).encode()).hexdigest()
        p1, p2 = int(hh[:8], 16), int(hh[8:16], 16)
        for i in range(d):
            probe_rows.append((str(p), i, (p1 + i * p2) % w))
    spark = df.sparkSession
    probe_df = spark.createDataFrame(
        probe_rows, "probe string, r int, c int"
    )
    return (
        probe_df.join(cells, ["r", "c"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_count"))
    )


def count_min_oracle_sql(
    table: str, value_col: str, probes: Sequence[str], d: int = 4,
    w: int = 1 << 12,
) -> str:
    """DuckDB re-derivation of count_min_freq — same counters, same
    probe cells, same min."""
    probe_values = ", ".join(
        "('{}')".format(str(p).replace("'", "''")) for p in probes
    )
    return f"""
WITH hashed AS (
  SELECT ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 9, 8))::BIGINT AS h2
  FROM {table}
),
cells AS (
  SELECT CAST(i AS INT) AS r, CAST((h1 + i * h2) % {w} AS INT) AS c,
         count(*) AS cnt
  FROM hashed, unnest(range(0, {d})) AS t(i)
  GROUP BY 1, 2
),
probes(probe) AS (VALUES {probe_values}),
probe_cells AS (
  SELECT probe, CAST(i AS INT) AS r,
         CAST((('0x' || substr(md5(probe), 1, 8))::BIGINT
               + i * ('0x' || substr(md5(probe), 9, 8))::BIGINT) % {w} AS INT)
           AS c
  FROM probes, unnest(range(0, {d})) AS t(i)
)
SELECT probe, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_count
FROM probe_cells LEFT JOIN cells USING (r, c)
GROUP BY probe
"""


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    probes_x100: "Sequence[int]",
    buckets: int = 1024,
) -> DataFrame:
    """Engine-portable quantile sketch: a fixed-width histogram over the
    column's [min, max] range, quantiles answered from bucket cumulative
    counts — the third mergeable sketch beside HLL and count-min (bucket
    count tables union/sum across runs or engines with the same range).

    Per probe q (in percent x100, e.g. 9900 = p99) returns
      (q_x100, bucket, cum_count, est_x1000)
    where bucket is the smallest histogram cell whose cumulative count
    reaches ceil(q/10000 * total) and est_x1000 quantizes the cell's
    upper edge.  All counters are exact BIGINTs; the only float ops are
    the shared bucket-index expression and the final edge quantization,
    both evaluated identically (IEEE double, same expression shape) by
    the DuckDB oracle.

    Scale shape: one min/max agg (broadcast single row), one
    groupBy(bucket) count with map-side combine — the histogram is
    `buckets` rows regardless of input size; the probe answer is a
    broadcast join against the cumulated histogram (a `buckets`-row
    window, never the corpus).  Accuracy is (max-min)/buckets — the
    documented fixed-width trade vs t-digest-style variable cells."""
    b = int(buckets)
    # NULLs are excluded like approx_percentile's: least(NULL, b-1) would
    # otherwise silently file every NULL as a maximum-value observation
    # AND count it in total, biasing every quantile upward
    vals = df.select(F.col(value_col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    mm = vals.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    cells = (
        vals.crossJoin(F.broadcast(mm))
        .select(
            F.when(
                F.col("hi") > F.col("lo"),
                F.least(
                    F.floor((F.col("v") - F.col("lo")) * b / (F.col("hi") - F.col("lo"))),
                    F.lit(b - 1),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # the histogram is <= `buckets` rows but feeds FOUR consumers
        # (cum, total, probe filter, final join) — materialize once so
        # the corpus scan+agg never reruns
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.withColumn("cum", F.sum("cnt").over(w).cast("long")).crossJoin(
        F.broadcast(cells.agg(F.sum("cnt").cast("long").alias("total")))
    )
    probes = df.sparkSession.createDataFrame(
        [(int(q),) for q in probes_x100], "q_x100 long"
    )
    hits = (
        probes.crossJoin(cum)
        .filter(F.col("cum") * 10000 >= F.col("q_x100") * F.col("total"))
        .groupBy("q_x100")
        .agg(F.min("bucket").alias("bucket"))
    )
    return (
        hits.join(cum.select("bucket", "cum"), "bucket")
        .crossJoin(F.broadcast(mm))
        .select(
            "q_x100",
            "bucket",
            F.col("cum").alias("cum_count"),
            F.floor(
                (F.col("lo")
                 + (F.col("bucket") + 1) * (F.col("hi") - F.col("lo")) / b)
                * 1000
            )
            .cast("long")
            .alias("est_x1000"),
        )
        .orderBy("q_x100")
    )


def histogram_quantiles_oracle_sql(
    table: str, value_col: str, probes_x100: "Sequence[int]",
    buckets: int = 1024,
) -> str:
    """Term-for-term DuckDB reimplementation (same expression shapes)."""
    b = int(buckets)
    probes = ", ".join(f"({int(q)})" for q in probes_x100)
    return f"""
WITH vals AS (
  SELECT CAST({value_col} AS DOUBLE) AS v FROM {table}
  WHERE {value_col} IS NOT NULL
), mm AS (
  SELECT min(v) AS lo, max(v) AS hi FROM vals
), cells AS (
  SELECT CASE WHEN hi > lo THEN CAST(least(
           floor((v - lo) * {b} / (hi - lo)),
           {b - 1}) AS BIGINT) ELSE 0 END AS bucket,
         count(*) AS cnt
  FROM vals, mm GROUP BY 1
), cum AS (
  SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST((SELECT sum(cnt) FROM cells) AS BIGINT) AS total
  FROM cells
), probes(q_x100) AS (VALUES {probes}), hits AS (
  SELECT q_x100, min(bucket) AS bucket
  FROM probes, cum WHERE cum * 10000 >= q_x100 * total GROUP BY 1
)
SELECT CAST(h.q_x100 AS BIGINT) AS q_x100, h.bucket,
       c.cum AS cum_count,
       CAST(floor((mm.lo + (h.bucket + 1) * (mm.hi - mm.lo) / {b}) * 1000)
            AS BIGINT) AS est_x1000
FROM hits h JOIN cum c USING (bucket), mm
ORDER BY q_x100
"""
