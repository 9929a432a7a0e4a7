"""Build-vs-exec profiler over the bench headline set.

For each headline query, separately time:
  build = calling queries[name](spark, sf_dir)  (plan construction, py4j)
  exec  = noop write of the returned frame      (engine execution)
Interleaved min-of-N, same bench-mode substrate as bench.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

from glonassdatamining_spark import registry
from glonassdatamining_spark.session import get_spark
import bench

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("gdm-buildexec")
spark.sparkContext.setLogLevel("ERROR")
queries = registry.all_queries()
headline = bench.pick_headline()

def materialize(df):
    df.write.format("noop").mode("overwrite").save()

# warm-up
for name in headline:
    materialize(queries[name](spark, sf_dir))

N = 3
build = {n: float("inf") for n in headline}
exe = {n: float("inf") for n in headline}
for rnd in range(N):
    for name in headline:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        materialize(df)
        t2 = time.perf_counter()
        build[name] = min(build[name], t1 - t0)
        exe[name] = min(exe[name], t2 - t1)

rows = sorted(headline, key=lambda n: -(build[n] + exe[n]))
out = {n: {"build": round(build[n], 3), "exec": round(exe[n], 3)} for n in rows}
with open("/tmp/buildexec_s2.json", "w") as fh:
    json.dump(out, fh, indent=1)
for n in rows:
    print(f"{build[n]+exe[n]:7.3f}  build {build[n]:6.3f}  exec {exe[n]:6.3f}  {n}")
