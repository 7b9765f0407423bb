"""Scaling-efficiency evidence: run the SAME extraction job on the SAME
input at local[8] and local[32] (sandbox proxy for N -> 4N executors, per
BASELINE.json north_rule) and report throughput at both plus

    efficiency = (throughput@32 / throughput@8) / 4

Target: >= 0.8.  Writes BENCH_scaling.json and prints the numbers.

Usage: python tools/bench_scaling.py [replicas]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = """
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); replicas = int(sys.argv[2])
from pdf_extract_spark.plans.session import get_spark
from pdf_extract_spark.operators.extraction import extract_documents
from pdf_extract_spark.sources.raw_docs import fixture_corpus_df

spark = get_spark(app_name=f"scale{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
raw = fixture_corpus_df(spark, replicas=replicas).cache()
n_docs = raw.count()
# warm-up pass (JIT, Arrow init) on a slice so the timed run measures steady state
extract_documents(raw.limit(64), num_partitions=cpus).count()
t0 = time.perf_counter()
out = extract_documents(raw, num_partitions=cpus * 2)
agg = out.groupBy().sum("n_spans", "decode_failures").collect()[0]
dt = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "docs": n_docs, "sec": dt,
                  "docs_per_sec": n_docs / dt,
                  "spans": int(agg[0] or 0),
                  "spans_per_sec": (agg[0] or 0) / dt,
                  "decode_failures": int(agg[1] or 0)}))
spark.stop()
"""


def run(cpus: int, replicas: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(replicas)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    r8 = run(8, replicas)
    r32 = run(32, replicas)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    report = {
        "input_docs": r8["docs"],
        "local8": {k: round(v, 2) if isinstance(v, float) else v for k, v in r8.items()},
        "local32": {k: round(v, 2) if isinstance(v, float) else v for k, v in r32.items()},
        "scaling_efficiency": round(eff, 3),
        "pass_ge_0.8": eff >= 0.8,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_scaling.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
