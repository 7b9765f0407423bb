"""Registry contract: every queries() entry has a same-named oracle (the
driver's correctness gate compares them side-by-side), every callable is
importable, and the entry module exposes the three required functions."""


def test_queries_and_oracles_align():
    from pdf_extract_spark.queries import ORACLES, QUERIES

    assert set(QUERIES) == set(ORACLES), (
        set(QUERIES) ^ set(ORACLES)
    )
    assert all(callable(f) for f in QUERIES.values())
    assert all(isinstance(s, str) and s.strip() for s in ORACLES.values())


def test_entry_module_surface():
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(q) == set(o) and len(q) >= 88
    assert callable(e.entry)
