"""Splice the accumulated same-rev scaling history (BENCH/scaling_best.json)
into BENCH/BASELINE.md: regenerates the two "### N → 4N" pair sections and
the capacity lines from ALL rounds on record, leaving the per-stage tables
and data-volume prose (which describe the original median round) intact.

Usage: python scripts/rebuild_baseline_md.py
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt2(v):
    return "n/a" if v is None else f"{v:.2f}"


with open(os.path.join("BENCH", "scaling_best.json")) as f:
    hist = json.load(f)

pairs = []
for key in sorted(hist["rounds"], key=lambda k: int(k.split(":")[0])):
    lo, hi = (int(x) for x in key.split(":"))
    rows = hist["rounds"][key]
    by_speedup = sorted(rows, key=lambda r: r["speedup"])
    median = by_speedup[(len(by_speedup) - 1) // 2]
    best = by_speedup[-1]
    pairs.append({
        "n": lo, "four_n": hi, **median,
        "best_speedup": best["speedup"],
        "best_efficiency": best["efficiency"],
        "best_hw_cpu_speedup": best["hw_cpu_speedup"],
        "hw_normalized_efficiency": (
            median["speedup"] / median["hw_mem_speedup"]
            if median["hw_mem_speedup"] else None),
        "all_rounds": rows,
    })

sections = []
for p in pairs:
    se = "; ".join(f"{k} {v:.2f}" for k, v in p["stage_efficiency"].items())
    rounds_tbl = "\n".join(
        f"| {i+1} | {r.get('docs') or '?'} | {r['n_wall']:.1f} "
        f"| {r['four_n_wall']:.1f} | {r['speedup']:.2f}× "
        f"| {r['efficiency']:.2f} | {r['hw_cpu_speedup']:.2f}× "
        f"| {r['hw_mem_speedup']:.2f}× |"
        for i, r in enumerate(p["all_rounds"])
    )
    sections.append(f"""### {p['n']} → {p['four_n']} cores (×{p['four_n']//p['n']})

- engine speedup (MEDIAN same-window round — the headline): **{p['speedup']:.2f}×** → raw efficiency **{p['efficiency']:.2f}**
- per-stage raw efficiency in the median round: {se}
- hardware capacity measured in the median round: CPU burn
  {p['hw_cpu_speedup']:.2f}×, memory-streaming burn {p['hw_mem_speedup']:.2f}×
- engine speedup ÷ memory-bandwidth speedup (median round): {_fmt2(p['hw_normalized_efficiency'])}
- best round for context: {p['best_speedup']:.2f}× (raw eff {p['best_efficiency']:.2f}), same-round hw CPU burn {p['best_hw_cpu_speedup']:.2f}×

All rounds (same-window N / 4N wall s, ratio, raw eff, hw burns; docs =
replicated corpus size for that round):

| round | docs | N wall | 4N wall | speedup | raw eff | hw cpu | hw mem |
|---|---|---|---|---|---|---|---|
{rounds_tbl}
""")

capacity_lines = "\n".join(
    f"- {p['n']}→{p['four_n']}: median engine speedup "
    f"**{p['speedup']:.2f}×** against a same-round hardware CPU-burn "
    f"capacity of {p['hw_cpu_speedup']:.2f}× (of a theoretical "
    f"{p['four_n']//p['n']}×) — the engine converted "
    f"**{p['speedup']/p['hw_cpu_speedup']:.2f}** of the parallel "
    f"capacity the box demonstrably offered in that window"
    for p in pairs
)

md = open("BENCH/BASELINE.md").read()
start = md.index("### 2 → 8 cores")
end = md.index("### Reading")
md = md[:start] + "\n".join(sections) + "\n" + md[end:]
# replace the capacity bullet block (between the fixed sentinel lines)
cap_start = md.index("- 2→8: median engine speedup")
cap_end = md.index("\n\nThe burns are engine-independent")
md = md[:cap_start] + capacity_lines + md[cap_end:]
open("BENCH/BASELINE.md", "w").write(md)
print(json.dumps({f"{p['n']}->{p['four_n']}": {
    "median_speedup": round(p["speedup"], 3),
    "raw_eff": round(p["efficiency"], 3),
    "rounds": len(p["all_rounds"])} for p in pairs}))
