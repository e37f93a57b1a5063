#!/usr/bin/env python3
"""Isolated-JVM bench driver: one fresh java process per query (no
cross-query GC/JIT/shuffle pollution), median of 3 via graft.BenchOne.

Usage: python3 tools/bench_isolated.py [--sf DIR] [--reps N] q2_date_range q41_tpch5 ...
Writes BENCH_ISOLATED.json {sf, results: {query: {median, runs}}} and
prints one line per query. Run `sbt -batch compile` first.
"""
import sys, json, subprocess, os

args = sys.argv[1:]
sf = "/root/testdata/sf0.1"
reps = "3"
queries = []
while args:
    a = args.pop(0)
    if a == "--sf":
        sf = args.pop(0)
    elif a == "--reps":
        reps = args.pop(0)
    else:
        queries.append(a)

add_opens = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar"]:
    add_opens += ["--add-opens", p + "=ALL-UNNAMED"]

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cp = f"{repo}/target/scala-2.13/classes:/opt/spark/jars/*"
env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf)
def write_results(results):
    with open(f"{repo}/BENCH_ISOLATED.json", "w") as f:
        json.dump({"sf": sf, "reps": int(reps), "results": results}, f, indent=1)

# extra JVM flags (GC choice, -Dspark.* conf overrides — local-mode
# SparkConf reads spark.* system properties) for per-knob A/B runs,
# mirroring build.sbt's SPARK_GRAFT_JVM_FLAGS passthrough
extra_flags = os.environ.get("SPARK_GRAFT_JVM_FLAGS", "").split()

results = {}
for q in queries:
    cmd = (["java", "-cp", cp] + add_opens +
           ["-Xmx" + os.environ.get("SPARK_DRIVER_MEM", "8g"),
            "-Dspark.ui.enabled=false"] + extra_flags +
           ["graft.BenchOne", q, reps])
    # a launch failure (missing java/classpath) or crash records a FAIL
    # entry instead of aborting the sweep; the JSON is rewritten after
    # every query so partial sweeps still leave a usable artifact
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=repo)
        line = [l for l in out.stdout.splitlines() if l.startswith('{"query"')]
    except OSError as e:
        print(f"FAIL {q}: launch error {e}")
        results[q] = {"median": -1.0, "runs": []}
        write_results(results)
        continue
    if not line:
        print(f"FAIL {q}: {out.stderr.strip().splitlines()[-3:]}")
        results[q] = {"median": -1.0, "runs": []}
        write_results(results)
        continue
    r = json.loads(line[-1])
    results[q] = {"median": r["median"], "runs": r["runs"]}
    print(f"{q}: median={r['median']} runs={r['runs']}")
    write_results(results)

write_results(results)
print("wrote BENCH_ISOLATED.json")
