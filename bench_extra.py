"""Optimization-round helper bench: time a SUBSET of contract queries
with the noop sink (guide §1.4), optionally dump .explain("formatted").

This file is NOT the driver's bench (bench.py is frozen); it exists so
single queries can be isolated and re-measured quickly while iterating.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
  flags: --reps N (default 2, best-of), --explain DIR (write plans),
         --all (every HEADLINE entry from bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chainalytic_framework_spark import contract
from chainalytic_framework_spark.session import build_session, prewarm_python_workers


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 2
    explain_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif args[i] == "--all":
            from bench import HEADLINE
            names.extend(HEADLINE); i += 1
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="cfs-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    prewarm_python_workers(spark)

    qs = contract.queries()
    out: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        out[name] = round(best, 3)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
