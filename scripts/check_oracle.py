"""Local replica of the driver's correctness gate: run every queries() entry
through Spark AND its oracle_sql() through DuckDB on the same parquet dir,
compare row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df) -> tuple[int, tuple, str]:
    """(n_rows, sorted column names, sha of sorted stringified rows)."""
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), tuple(cols), h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from named_entity_discovery_and_linking_spark.session import get_spark

    spark = get_spark("oracle-check", extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        s = value_hash(sdf)
        d = value_hash(ddf)
        status = "ok  " if s == d else "FAIL"
        if s != d:
            failures.append(name)
        print(f"{status} {name}: spark={s[0]} duck={d[0]} cols_match={s[1]==d[1]} hash_match={s[2]==d[2]} [{time.time()-t0:.1f}s]")
        if s != d and s[1] != d[1]:
            print(f"     spark cols: {s[1]}\n     duck cols : {d[1]}")
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
