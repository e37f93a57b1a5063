#!/usr/bin/env python3
"""Render results/rq6_routed/summary.json into README.md.

The interleaved protocol runs every arm back-to-back per (stream, query),
so the honest statistics are PAIRED: per-query ratios routed/fixed, plus
the deterministic bytes/files dimension (the router optimizes kept file
bytes; wall time follows it through the page cache and scan cost).
"""
import json
import math
import sys
from collections import defaultdict


def main(d="results/rq6_routed"):
    s = json.load(open(f"{d}/summary.json"))
    qs = s["queries"]
    by = defaultdict(dict)
    for r in qs:
        by[(r["stream"], r["q"])][r["arm"]] = r
    arms = list(s["arm_totals"])
    fixed = [a for a in arms if a != "routed"]

    def gm(xs):
        xs = [x for x in xs if x > 0]
        return math.exp(sum(math.log(x) for x in xs) / len(xs)) if xs else float("nan")

    paired = {a: gm([v["routed"]["sec"] / v[a]["sec"] for v in by.values()
                     if "routed" in v and a in v]) for a in fixed}
    bytes_tot = {a: sum(v[a]["bytes"] for v in by.values()) for a in arms}
    files_tot = {a: sum(v[a]["files"] for v in by.values()) for a in arms}
    # deterministic guarantee check: routed kept-bytes <= each fixed arm's
    over = {a: sum(1 for v in by.values()
                   if v["routed"]["bytes"] > v[a]["bytes"]) for a in fixed}
    picks = defaultdict(int)
    for v in by.values():
        for t, c in v["routed"]["routed"].items():
            picks[(t, c["layout"])] += 1

    lines = []
    w = lines.append
    w("# RQ6 with per-query layout routing (round-19, VERDICT r18 Next #4)")
    w("")
    w(f"`graft.cli.Rq6Routed {s['sf_dir']} {d} {s['scenario']} "
      f"{s['streams']} {s['files_per_table']}` — all layout variants stay")
    w("materialized (the reference registers them side by side,")
    w("tpch_all_runner.py:143-165) and the `routed` arm sends each stream")
    w("query to the variant whose zone maps keep the fewest bytes for ITS")
    w("predicates (`table/LayoutRouter`). Arms run INTERLEAVED per")
    w("(stream, query) with rotating order, so every comparison below is")
    w("paired — host drift hits all arms of a pair equally.")
    w("")
    w("## Arm totals (3 streams x 22 TPC-H queries, seconds)")
    w("")
    w("| arm | total s | scan bytes | files scanned |")
    w("|---|---|---|---|")
    for a in arms:
        w(f"| {a} | {s['arm_totals'][a]:.1f} | {bytes_tot[a]/1e6:.1f} MB "
          f"| {files_tot[a]} |")
    w("")
    w(f"Routing cost: {s['route_sec']:.1f} s total across "
      f"{3*22} routed queries (manifest prunes ride the read cache), "
      "accounted separately from query wall time.")
    w("")
    w("## Paired per-query geomean (routed / fixed; <1 = routed faster)")
    w("")
    w("(The bytes column is the task-level scan metric; the router's")
    w("objective is KEPT FILE BYTES per table, so a per-query flip can")
    w("happen when a pruned file's read chunks differ from its on-disk")
    w("share — totals and geomeans are the honest summary.)")
    w("")
    w("| vs arm | geomean sec ratio | queries where routed SCANNED more bytes |")
    w("|---|---|---|")
    for a in fixed:
        w(f"| {a} | {paired[a]:.3f} | {over[a]} / {len(by)} |")
    w("")
    w("## Per-table variant picks (66 routed query-registrations)")
    w("")
    w("| table | variant | picks |")
    w("|---|---|---|")
    for (t, l), c in sorted(picks.items()):
        w(f"| {t} | {l} | {c} |")
    w("")
    out = f"{d}/README.md"
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    for a in fixed:
        print(f"routed vs {a}: paired gm {paired[a]:.3f}, "
              f"bytes over {over[a]}/{len(by)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
