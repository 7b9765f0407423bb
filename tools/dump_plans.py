"""Dump .explain('formatted') for a set of registry queries to text files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [query ...]
With no query names, dumps every query in bench.py's HEADLINE list.
Used to produce the committed plans/r07/<query>_{before,after}.txt
evidence for the optimization round.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pdf_extract_spark.plans.session import get_spark
    from pdf_extract_spark.queries import QUERIES

    spark = get_spark(app_name="dump_plans", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    if not names:
        import bench
        names = bench.HEADLINE
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
