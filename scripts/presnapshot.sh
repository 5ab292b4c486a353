#!/bin/sh
# Pre-snapshot gate (judge r4 next-round #1): the round-4 bar violation was
# shipping semantic changes with a red suite.  Run this before EVERY
# end-of-round snapshot commit; it refuses on any failure.
#
#   sh scripts/presnapshot.sh
#
# 1. full pytest suite (the ONLY acceptable definition of "green");
# 2. the driver-contract smoke: __spark_entry__.entry() runs and the
#    queries()/oracle_sql() keys line up.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python - <<'PY'
import __spark_entry__ as e
q, o = e.queries(), e.oracle_sql()
missing = set(o) - set(q)
assert not missing, f"oracle_sql keys without queries(): {missing}"
from named_entity_discovery_and_linking_spark.session import get_spark
spark = get_spark("presnapshot", master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
df = e.entry(spark)
n = df.count()
print(f"entry() OK: {n} rows; {len(q)} queries, {len(o)} oracles")
spark.stop()
PY
echo "presnapshot gate: GREEN"
