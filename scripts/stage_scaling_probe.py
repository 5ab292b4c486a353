"""Diagnostic: per-stage wall time at local[N] vs local[4N] (same input) to
find which stage fails to scale.  Writes one JSON line per (cpus, stage)."""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); replicate = int(sys.argv[2])
os.environ.setdefault("SPARK_DRIVER_MEM", "64g")
from named_entity_discovery_and_linking_spark.session import get_spark
from named_entity_discovery_and_linking_spark.plans import driver_queries as DQ
from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs
from named_entity_discovery_and_linking_spark.operators.mentions import discover_mentions
from named_entity_discovery_and_linking_spark.operators.linking import link_mentions
from named_entity_discovery_and_linking_spark.plans.graph import build_graph
spark = get_spark("probe", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
# warmup all shapes at small scale
DQ.kg_pipeline(spark, sf, 2).count()
out = {{"cpus": cpus}}
t0=time.time(); pages = DQ.derived_pages(spark, sf, replicate).localCheckpoint(); out["pages"] = round(time.time()-t0,1)
t0=time.time(); m = discover_mentions(pages).localCheckpoint(); out["mentions"] = round(time.time()-t0,1)
kb, al = kb_dfs(spark)
t0=time.time(); links = link_mentions(m, kb, al).localCheckpoint(); out["links"] = round(time.time()-t0,1)
t0=time.time(); n = build_graph(m, links)[0].count(); out["graph"] = round(time.time()-t0,1)
out["triples"] = n
print(json.dumps(out))
"""


def run(cpus, replicate):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", CHILD.format(repo=repo), str(cpus), str(replicate)],
                         capture_output=True, text=True, timeout=1500)
    return [l for l in out.stdout.splitlines() if l.startswith("{")][-1]


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print(run(n, rep))
    print(run(4 * n, rep))
