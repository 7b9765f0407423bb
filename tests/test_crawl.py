"""Politeness fetch-wave scheduler (operators/crawl.py): per-host cap
invariants, grouped two-phase rank correctness vs a plain window, and
partition-layout invariance."""

from pyspark.sql import functions as F

from pdf_extract_spark.operators.crawl import fetch_waves, wave_profile


def _frontier(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "url string, host string")
    return df.repartition(parts) if parts else df


def _rows(n_hosts=3, per_host=(9, 4, 1)):
    out = []
    for h in range(n_hosts):
        for i in range(per_host[h]):
            out.append((f"https://h{h}.test/p{i}", f"h{h}.test"))
    return out


def test_fetch_waves_cap_invariant(spark):
    """No (host, wave) group may exceed the cap; slots within it must be
    exactly 0..k-1; host ranks must be a 1..n permutation."""
    waves = fetch_waves(_frontier(spark, _rows()), per_host_cap=4).collect()
    by_hw = {}
    by_host = {}
    for r in waves:
        by_hw.setdefault((r.host, r.wave), []).append(r.slot)
        by_host.setdefault(r.host, []).append(r.host_rank)
    for slots in by_hw.values():
        assert len(slots) <= 4
        assert sorted(slots) == list(range(len(slots)))
    for ranks in by_host.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # 9 URLs at cap 4 -> waves 0,1,2; 1 URL -> wave 0 only
    assert max(r.wave for r in waves if r.host == "h0.test") == 2
    assert max(r.wave for r in waves if r.host == "h2.test") == 0


def test_fetch_waves_matches_plain_window(spark):
    """The two-phase distributed rank must equal the textbook per-host
    row_number window (which it exists to replace at scale)."""
    df = _frontier(spark, _rows(), parts=7)
    got = {r.url: (r.host_rank, r.wave, r.slot)
           for r in fetch_waves(df, per_host_cap=3).collect()}
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.md5(F.encode(F.col("url"), "utf-8")), "url"
    )
    ref = {
        r.url: (r.rn, (r.rn - 1) // 3, (r.rn - 1) % 3)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == ref


def test_fetch_waves_partition_invariance(spark):
    """Identical assignment regardless of input partitioning."""
    rows = _rows(per_host=(13, 6, 2))
    a = {r.url: (r.host_rank, r.wave, r.slot)
         for r in fetch_waves(_frontier(spark, rows, parts=1),
                              per_host_cap=5).collect()}
    b = {r.url: (r.host_rank, r.wave, r.slot)
         for r in fetch_waves(_frontier(spark, rows, parts=16),
                              per_host_cap=5).collect()}
    assert a == b


def test_wave_profile_counts(spark):
    """Per-wave load profile: wave 0 carries cap URLs from every host
    that has any; the last wave carries the remainders."""
    waves = fetch_waves(_frontier(spark, _rows()), per_host_cap=4)
    prof = {r.wave: (r.n_urls, r.n_hosts) for r in wave_profile(waves).collect()}
    # host sizes 9,4,1 at cap 4 -> wave0: 4+4+1, wave1: 4+0(?); h1 fills
    # wave0 exactly; wave1 holds h0's next 4; wave2 h0's last 1
    assert prof[0] == (9, 3)
    assert prof[1] == (4, 1)
    assert prof[2] == (1, 1)


def test_fetch_waves_null_host_not_dropped(spark):
    """NULL hosts form one politeness group and must survive the rank
    join (the null-safe __hk key; a raw equi-join would drop them)."""
    rows = [("https://a.test/1", None), ("https://a.test/2", None),
            ("https://b.test/1", "b.test")]
    waves = fetch_waves(_frontier(spark, rows), per_host_cap=1).collect()
    assert len(waves) == 3
    null_ranks = sorted(r.host_rank for r in waves if r.host is None)
    assert null_ranks == [1, 2]
    assert [r.wave for r in waves if r.host == "b.test"] == [0]
