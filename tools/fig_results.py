#!/usr/bin/env python3
"""Figure generation for the results tree (driver-side, stdlib only).

The reference ships analysis notebooks (notebooks/fig_rq*_*.ipynb +
viz_results_toolkit.py) that render its runner CSVs; this is the repo's
counterpart over our format-compatible artifacts -> results/figs/*.svg.
No matplotlib in the sandbox, so charts are hand-emitted SVG following
a validated 4-hue categorical palette (order fixed: blue, orange, aqua,
yellow; CVD-checked). Every figure's underlying numbers live in the
sibling CSV/JSON artifacts (the table view).

Usage: python3 tools/fig_results.py [outDir]
"""
import csv, json, math, os, sys, glob, statistics

PAL = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#8a5cd6", "#d64a78"]
INK, MUT, GRID = "#333333", "#666666", "#e5e5e0"
SURF = "#fcfcfb"


class Svg:
    def __init__(self, w, h):
        self.w, self.h = w, h
        self.parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
            f'viewBox="0 0 {w} {h}" font-family="Helvetica,Arial,sans-serif">',
            f'<rect width="{w}" height="{h}" fill="{SURF}"/>']

    def rect(self, x, y, w, h, fill, rx=0):
        self.parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{w:.1f}" height="{h:.1f}" '
            f'fill="{fill}" rx="{rx}"/>')

    def line(self, x1, y1, x2, y2, stroke, sw=1, dash=None):
        d = f' stroke-dasharray="{dash}"' if dash else ""
        self.parts.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="{stroke}" stroke-width="{sw}"{d}/>')

    def path(self, pts, stroke, sw=2):
        d = "M" + " L".join(f"{x:.1f},{y:.1f}" for x, y in pts)
        self.parts.append(
            f'<path d="{d}" fill="none" stroke="{stroke}" stroke-width="{sw}" '
            f'stroke-linejoin="round"/>')

    def circle(self, x, y, r, fill):
        self.parts.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r}" fill="{fill}" '
            f'stroke="{SURF}" stroke-width="2"/>')

    def text(self, x, y, s, size=11, fill=INK, anchor="start", weight="normal"):
        self.parts.append(
            f'<text x="{x:.1f}" y="{y:.1f}" font-size="{size}" fill="{fill}" '
            f'text-anchor="{anchor}" font-weight="{weight}">{s}</text>')

    def save(self, path):
        self.parts.append("</svg>")
        with open(path, "w") as f:
            f.write("\n".join(self.parts))
        print(f"[figs] wrote {path}")


def grouped_bars(path, title, groups, series, values, unit="x", ref=None,
                 note=None):
    """groups: x categories; series: <=4 names; values[s][g] -> float."""
    gw = max(56, 30 * len(series) + 18)
    w = 90 + gw * len(groups) + 30
    h = 300
    s = Svg(w, h + (16 if note else 0))
    s.text(12, 22, title, 13, INK, weight="bold")
    top, bot, left = 44, h - 46, 56
    vmax = max(max(values[x].values()) for x in series) * 1.15
    for t in range(5):
        v = vmax * t / 4
        y = bot - (bot - top) * t / 4
        s.line(left, y, w - 16, y, GRID)
        s.text(left - 6, y + 4, f"{v:.1f}", 10, MUT, "end")
    if ref is not None:
        y = bot - (bot - top) * ref / vmax
        s.line(left, y, w - 16, y, MUT, 1, "4,3")
    bw = (gw - 18) / len(series)
    for gi, g in enumerate(groups):
        x0 = left + 10 + gi * gw
        for si, sn in enumerate(series):
            v = values[sn].get(g)
            if v is None:
                continue
            bh = (bot - top) * v / vmax
            x = x0 + si * bw
            s.rect(x, bot - bh, bw - 2, bh, PAL[si], rx=3)
            s.text(x + bw / 2 - 1, bot - bh - 4, f"{v:.2f}", 9, INK, "middle")
        s.text(x0 + (gw - 18) / 2, bot + 16, str(g), 11, INK, "middle")
    lx = left
    for si, sn in enumerate(series):
        s.rect(lx, h - 22, 10, 10, PAL[si], rx=2)
        s.text(lx + 14, h - 13, sn, 11, MUT)
        lx += 24 + 7 * len(sn)
    if ref is not None:
        s.text(w - 16, 36, f"geomean speedup ({unit} vs baseline)", 10, MUT, "end")
    else:
        s.text(w - 16, 36, unit, 10, MUT, "end")
    if note:
        s.text(12, h + 10, note, 10, MUT)
    s.save(path)


def hbar(path, title, rows, vmax=None, ref=1.0, color=PAL[0], unit="x"):
    """rows: [(label, value)] sorted; horizontal bars with value labels."""
    h = 58 + 22 * len(rows)
    w = 560
    s = Svg(w, h)
    s.text(12, 22, title, 13, INK, weight="bold")
    left, right, top = 170, w - 70, 40
    vmax = vmax or max(v for _, v in rows) * 1.1
    for t in range(5):
        v = vmax * t / 4
        x = left + (right - left) * t / 4
        s.line(x, top - 6, x, h - 24, GRID)
        s.text(x, h - 10, f"{v:.1f}", 10, MUT, "middle")
    if ref is not None and ref < vmax:
        x = left + (right - left) * ref / vmax
        s.line(x, top - 6, x, h - 24, MUT, 1, "4,3")
    for i, (lab, v) in enumerate(rows):
        y = top + i * 22
        bw = (right - left) * v / vmax
        s.rect(left, y, bw, 14, color, rx=3)
        s.text(left - 6, y + 11, lab, 10, INK, "end")
        s.text(left + bw + 5, y + 11, f"{v:.2f}{unit}", 10, INK)
    s.save(path)


def lines(path, title, xs, series, logx=False, logy=False, xlabel="",
          ylabel="", yfmt="{:.2f}", note=None):
    """series: [(name, {x: y})], <=4; direct end labels + legend."""
    w, h = 560, 330
    s = Svg(w, h + (16 if note else 0))
    s.text(12, 22, title, 13, INK, weight="bold")
    left, right, top, bot = 64, w - 110, 44, h - 52
    fx = (lambda v: math.log10(v)) if logx else (lambda v: v)
    ys_all = [y for _, d in series for y in d.values()]
    fy = (lambda v: math.log10(max(v, 1e-5))) if logy else (lambda v: v)
    x0, x1 = fx(min(xs)), fx(max(xs))
    y0, y1 = min(fy(v) for v in ys_all), max(fy(v) for v in ys_all)
    if y0 == y1:
        y0, y1 = y0 - 1, y1 + 1
    pad = (y1 - y0) * 0.08
    y0, y1 = y0 - pad, y1 + pad
    def X(v): return left + (right - left) * (fx(v) - x0) / (x1 - x0)
    def Y(v): return bot - (bot - top) * (fy(v) - y0) / (y1 - y0)
    for xv in xs:
        s.line(X(xv), top, X(xv), bot, GRID)
        s.text(X(xv), bot + 14, f"{xv:,}" if xv >= 1000 else str(xv), 9, MUT,
               "middle")
    ticks = sorted({min(ys_all), max(ys_all)} |
                   ({10 ** t for t in range(-4, 3)
                     if y0 <= t <= y1} if logy else
                    {y0 + (y1 - y0) * t / 4 for t in range(5)}))
    for tv in ticks:
        s.line(left, Y(tv), right, Y(tv), GRID)
        s.text(left - 6, Y(tv) + 4, yfmt.format(tv), 9, MUT, "end")
    for si, (name, d) in enumerate(series):
        pts = [(X(xv), Y(d[xv])) for xv in xs if xv in d]
        s.path(pts, PAL[si], 2)
        for p in pts:
            s.circle(p[0], p[1], 3.5, PAL[si])
        s.text(pts[-1][0] + 8, pts[-1][1] + 4, name, 10, INK)
    s.text(left, h - 16, xlabel, 10, MUT)
    s.text(w - 16, h - 16, ylabel, 10, MUT, "end")
    if note:
        s.text(12, h + 10, note, 10, MUT)
    s.save(path)


def main(out="results/figs"):
    os.makedirs(out, exist_ok=True)

    # rq1 sf16: band x layout geomean speedup
    for sf in ("rq1_sf16", "rq1_sf10", "rq1_sf32", "rq1_sf64"):
        p = f"results/{sf}/geomean_speedup.csv"
        if not os.path.exists(p):
            continue
        rows = list(csv.DictReader(open(p)))
        vals = {}
        for r in rows:
            if r["layout"] == "baseline" or not r["geomean_speedup"]:
                continue
            vals.setdefault(r["layout"], {})[r["band"]] = float(r["geomean_speedup"])
        bands = sorted({r["band"] for r in rows})
        grouped_bars(f"{out}/fig_{sf}_speedup.svg",
                     f"RQ1 {sf.split('_')[1]}: wall speedup by selectivity band",
                     bands, [l for l in ("linear", "zorder", "hilbert") if l in vals],
                     vals, ref=1.0,
                     note="bands S1 (finest) - S4; dashed line = baseline parity; data: geomean_speedup.csv")

    # rq1 ladder: S1 speedup and files-ratio vs scale (the 100 TB trend:
    # kept-file count is ~constant, so speedup grows with the corpus)
    ladder = {}
    for sfn, sfv in (("rq1_sf16", 16), ("rq1_sf32", 32), ("rq1_sf64", 64)):
        p = f"results/{sfn}/geomean_speedup.csv"
        if not os.path.exists(p):
            continue
        for r in csv.DictReader(open(p)):
            if r["band"] == "S1" and r["layout"] != "baseline" and r["geomean_speedup"]:
                ladder.setdefault(r["layout"], {})[sfv] = float(r["geomean_speedup"])
    if ladder and all(len(d) >= 3 for d in ladder.values()):
        xs = sorted({x for d in ladder.values() for x in d})
        lines(f"{out}/fig_rq1_ladder.svg",
              "RQ1 S1 wall speedup vs scale factor (sf16 - sf64)",
              xs, sorted(ladder.items()), logx=True, xlabel="scale factor (log)",
              ylabel="geomean speedup vs baseline", yfmt="{:.0f}",
              note="fixed-selectivity band keeps ~constant files while the table grows; data: rq1_sf*/geomean_speedup.csv")

    # rq6 sf10 byte-balanced: per-query hilbert speedup
    def med(layout):
        acc = {}
        for f in glob.glob(f"results/rq6_sf10_bb/{layout}/stream_*/2*/results.csv"):
            for r in csv.DictReader(open(f)):
                acc.setdefault(r["query"], []).append(float(r["elapsedTime_s"]))
        return {q: statistics.median(v) for q, v in acc.items()}
    nl, hb = med("no_layout"), med("hilbert")
    if nl and hb:
        rows = sorted(((q.replace(".sql", "").upper(), nl[q] / hb[q]) for q in nl),
                      key=lambda t: -t[1])
        hbar(f"{out}/fig_rq6_sf10_bb.svg",
             "RQ6 sf10 (byte-balanced): hilbert speedup vs unsorted, median of 3 streams",
             rows, color=PAL[0])

    # rq5: arm ranking
    p = "results/rq5/geomean_by_family.csv"
    if os.path.exists(p):
        fam = {}
        for r in csv.DictReader(open(p)):
            if r["geomean_speedup"]:
                fam.setdefault(r["layout"], []).append(float(r["geomean_speedup"]))
        gm = lambda xs: math.exp(sum(math.log(x) for x in xs) / len(xs))
        rows = sorted(((a, gm(v)) for a, v in fam.items() if a != "baseline"),
                      key=lambda t: -t[1])
        hbar(f"{out}/fig_rq5_ranking.svg",
             "RQ5: sort-order arms ranked (geomean wall speedup over all families)",
             rows, color=PAL[2])

    # ann: recall curves + latency crossover
    pts = []
    for f, n in (("results/ann_scale.json", "2M"),
                 ("results/ann_scale_8m.json", "8M"),
                 ("results/ann_scale_16m.json", "16M"),
                 ("results/ann_scale_32m.json", "32M"),
                 ("results/ann_scale_64m.json", "64M")):
        if os.path.exists(f):
            pts.append((n, json.load(open(f))))
    if pts:
        for width, key in (("k16", "recall_curve_k16"), ("k256", "recall_curve_k256")):
            xs = sorted({int(s) for _, d in pts for s in d[key]})
            series = [(n, {int(s): v for s, v in d[key].items()}) for n, d in pts]
            lines(f"{out}/fig_ann_recall_{width}.svg",
                  f"PQ {width}: re-rank recall@5 vs shortlist size",
                  xs, series, logx=True, xlabel="shortlist S (log)",
                  ylabel="recall@5 vs exact",
                  note="planted-through-rerank = 1.00 at S>=500 everywhere; data: ann_scale*.json")
        vals = {"flat ADC": {}, "IVF probe4": {}, "probe4+rerank": {}}
        for n, d in pts:
            vals["flat ADC"][n] = d["sec_adc_1q"]
            vals["IVF probe4"][n] = d["sec_ivfpq_1q_probe4"]
            vals["probe4+rerank"][n] = d.get("sec_ivfpq_rr_1q", 0)
        grouped_bars(f"{out}/fig_ann_crossover.svg",
                     "ANN per-query latency: the IVF-PQ crossover",
                     [n for n, _ in pts], list(vals), vals,
                     unit="seconds per query", ref=None,
                     note="IVF probes 4/16 hive partitions (planning-time pruning); data: ann_scale*.json")

        # residual IVFADC (r19): recall curves + the scaling law "shortlist
        # needed for recall@5 >= 0.8 as a function of corpus size"
        res_key = "recall_curve_res_probe16"
        if any(res_key in d for _, d in pts):
            xs = sorted({int(s) for _, d in pts for s in d.get(res_key, {})})
            series = [(n, {int(s): v for s, v in d[res_key].items()})
                      for n, d in pts if res_key in d]
            lines(f"{out}/fig_ann_recall_residual.svg",
                  "Residual IVFADC: re-rank recall@5 vs shortlist size",
                  xs, series, logx=True, xlabel="shortlist S (log)",
                  ylabel="recall@5 vs exact",
                  note="codes quantize x - coarse centroid (k'=1024/4096 lists, probe16); data: ann_scale*.json")

            def s_for(d, key):
                c = {int(s): v for s, v in d.get(key, {}).items()}
                hits = [s for s in sorted(c) if c[s] >= 0.8]
                return hits[0] if hits else None
            law = {"raw k256 codes": {}, "residual codes": {}}
            for n, d in pts:
                s_raw = s_for(d, "recall_curve_k256")
                s_res = s_for(d, res_key)
                if s_raw: law["raw k256 codes"][n] = s_raw
                if s_res: law["residual codes"][n] = s_res
            grouped_bars(f"{out}/fig_ann_scaling_law.svg",
                         "Shortlist needed for re-rank recall@5 >= 0.8",
                         [n for n, _ in pts], list(law), law,
                         unit="shortlist S", ref=None,
                         note="missing bar = 0.8 never reached on the measured S grid; data: ann_scale*.json")

    # manifest scaling
    p = "results/manifest_scale.json"
    if os.path.exists(p):
        d = json.load(open(p))
        xs = [r["n"] for r in d["points"]]
        series = [(k, {r["n"]: r[f] for r in d["points"]})
                  for k, f in (("commit", "write_sec"), ("cold read", "read_sec"),
                               ("cached read", "read_cached_sec"),
                               ("prune", "prune_sec"))]
        lines(f"{out}/fig_manifest_scale.svg",
              "Manifest latency vs file entries (JSONL sidecar + read cache)",
              xs, series, logx=True, logy=True, xlabel="file entries (log)",
              ylabel="seconds (log)", yfmt="{:g}",
              note="sidecar engages at 50k entries; data: manifest_scale.json")


if __name__ == "__main__":
    main(*sys.argv[1:2])
