"""Ad-hoc per-query timing harness for the optimization rounds (bench.py
is frozen for measurement; this file is for isolating and iterating).

Usage: python bench_extra.py [-n REPS] query [query ...]
Times each named registry query with the same min-of-N count() protocol
as bench.py, after the same warm-up, and prints one line per query.
`--noop` forces full-column evaluation through the noop sink instead of
count() (guide §1.4).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pdf_extract_spark.plans.session import get_spark
    from pdf_extract_spark.queries import QUERIES

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()  # warm-up
    from bench import _unpersist_all

    for name in args.queries:
        fn = QUERIES[name]
        samples = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.perf_counter() - t0, 3))
            _unpersist_all(spark)
        print(f"{min(samples):7.3f}  {name}  samples={samples}")
    spark.stop()


if __name__ == "__main__":
    main()
