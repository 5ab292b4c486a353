"""Capture .explain('formatted') for every headline bench query.

Usage: python scripts/r07_plans.py <out_dir> [sf_dir] [query ...]

Writes <out_dir>/<query>.txt.  Used to produce plans/r07/<q>_before.txt and
_after.txt (optimization-round deliverable).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    from named_entity_discovery_and_linking_spark.session import get_spark
    from named_entity_discovery_and_linking_spark.plans import driver_queries as DQ

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "r07-plans", master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    lookup = {**DQ.BENCH_COMPAT, **DQ.QUERIES}
    for name in bench.HEADLINE:
        if only and name not in only:
            continue
        df = lookup[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", os.path.join(out_dir, f"{name}.txt"))


if __name__ == "__main__":
    main()
