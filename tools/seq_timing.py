"""Time the bench HEADLINE queries sequentially in one session (debug)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from pdf_extract_spark.plans.session import get_spark  # noqa: E402
from pdf_extract_spark.queries import QUERIES  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    for name in bench.HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
