#!/usr/bin/env python3
"""Build BENCH_SF10_TPCH.json / BENCH_SF16_TPCH.json from `graft.Bench tpch`
outputs at /tmp, named tpch_<sf>_<runtag>.json (e.g. tpch_sf10_r13a.json) —
each the grep'd one-line JSON, possibly preceded by a shuffle.partitions
stderr line. The glob is /tmp/tpch_{sf}_*.json; bare /tmp/tpch_sf10.json is
NOT picked up.

Adds the round-11 VERDICT "Next #3" column: us_per_row = wall_sec * 1e6 /
lineitem_rows — the latency-floor defense of decade ratios as data, not
narrative. Run after min-of-N merging (pass several files per scale).
"""
import json, sys, re

ROWS = {"sf1": 6_000_000, "sf10": 60_000_000, "sf16": 96_000_000}


def load(paths):
    best = {}
    parts = None
    for p in paths:
        for line in open(p):
            line = line.strip()
            m = re.search(r"shuffle.partitions=(\d+)", line)
            if m:
                if parts is not None and parts != int(m.group(1)):
                    print(f"WARNING: merged runs used differing "
                          f"shuffle.partitions ({parts} vs {m.group(1)}) "
                          f"in {p}", file=sys.stderr)
                parts = int(m.group(1))
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            for q, s in d["queries"].items():
                if s > 0 and (q not in best or s < best[q]):
                    best[q] = s
    return best, parts


def main():
    import glob
    note_env = sys.argv[1] if len(sys.argv) > 1 else ""
    out = {}
    for sf in ("sf1", "sf10", "sf16"):
        files = sorted(glob.glob(f"/tmp/tpch_{sf}_*.json"))
        if not files:
            continue
        q, parts = load(files)
        out[sf] = {"queries": q, "partitions": parts, "runs": len(files)}

    sf1 = out.get("sf1", {}).get("queries", {})
    sf10 = out.get("sf10", {}).get("queries", {})
    sf16 = out.get("sf16", {}).get("queries", {})

    def entry(sec, rows, base_sec, base_rows):
        e = {"sec": round(sec, 3),
             "us_per_row": round(sec * 1e6 / rows, 4)}
        if base_sec:
            e["vs_ratio"] = round(sec / base_sec, 2)
            e["base_us_per_row"] = round(base_sec * 1e6 / base_rows, 4)
            # the latency-floor test as data: per-row cost NOT growing
            # across the decade means the wall ratio is floor-dominated
            e["per_row_growth"] = round(
                (sec / rows) / (base_sec / base_rows), 2)
        return e

    if sf10:
        art = {
            "note": note_env,
            "sf": "/tmp/sf10", "lineitem_rows": ROWS["sf10"],
            "shuffle_partitions": out["sf10"]["partitions"],
            "total_sec": round(sum(sf10.values()), 2),
            "queries": {q: entry(s, ROWS["sf10"], sf1.get(q), ROWS["sf1"])
                        for q, s in sorted(sf10.items())},
        }
        json.dump(art, open("/root/repo/BENCH_SF10_TPCH.json", "w"), indent=1)
        print("sf10 total", art["total_sec"])
    if sf16:
        art = {
            "note": note_env,
            "sf": "/tmp/sf16", "lineitem_rows": ROWS["sf16"],
            "shuffle_partitions": out["sf16"]["partitions"],
            "total_sec": round(sum(sf16.values()), 2),
            "queries": {q: entry(s, ROWS["sf16"], sf10.get(q), ROWS["sf10"])
                        for q, s in sorted(sf16.items())},
        }
        json.dump(art, open("/root/repo/BENCH_SF16_TPCH.json", "w"), indent=1)
        print("sf16 total", art["total_sec"])


if __name__ == "__main__":
    main()
