"""Snapshot / compare declared-query outputs — the equivalence proof tool
for the r07 optimization round.

Usage:
  python scripts/r07_diff.py snap  <dir> <sf_dir> [query ...]   # write baselines
  python scripts/r07_diff.py check <dir> <sf_dir> [query ...]   # diff vs baselines

Baselines are parquet files of the query output sorted by all columns.
`check` re-runs each query against the CURRENT tree and compares cell-for-
cell with the driver's tolerance (floats formatted at 6 decimal places,
everything else stringified), order-insensitively.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def canon(pdf):
    """Order-insensitive canonical form: sorted tuple list with floats at
    the driver's .6f comparison tolerance (scripts/check_oracle.py)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in row) for row in pdf.itertuples(index=False))
    return cols, rows


def main():
    mode, out_dir, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4:])
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from named_entity_discovery_and_linking_spark.session import get_spark
    from named_entity_discovery_and_linking_spark.plans import driver_queries as DQ

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "r07-diff", master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(entry_mod.queries())
    # bench-compat names are timed by the frozen bench.py, so pin them too
    for name, fn in DQ.BENCH_COMPAT.items():
        qs.setdefault(name, lambda s, d, fn=fn: fn(s, d))

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}.parquet")
        try:
            pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"ERROR  {name}: {e}")
            failures.append(name)
            continue
        if mode == "snap":
            pdf.to_parquet(path)
            print(f"snap   {name}: {len(pdf)} rows")
        else:
            import pandas as pd

            base = pd.read_parquet(path)
            bc, br = canon(base)
            nc, nr = canon(pdf)
            if bc != nc:
                print(f"FAIL   {name}: columns {bc} != {nc}")
                failures.append(name)
            elif br != nr:
                ndiff = sum(1 for a, b in zip(br, nr) if a != b) + abs(len(br) - len(nr))
                print(f"FAIL   {name}: {len(br)} vs {len(nr)} rows, ~{ndiff} differing")
                sa, sb = set(br), set(nr)
                for r in list(sa - sb)[:3]:
                    print(f"   only-base: {r[:200]}")
                for r in list(sb - sa)[:3]:
                    print(f"   only-new : {r[:200]}")
                failures.append(name)
            else:
                print(f"OK     {name}: {len(nr)} rows identical")
    if mode == "check":
        print("RESULT:", "FAIL " + ",".join(failures) if failures else "ALL OK")
        sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
