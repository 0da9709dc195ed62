"""Generate SCALING_r{N}.md from three bench JSON files.

Usage: python tools/make_scaling_md.py <round> <sf0.001.json> <sf0.01.json> <sf0.1.json>
"""
import json
import sys


def main() -> int:
    rnd, f1, f2, f3 = sys.argv[1:5]
    runs = [json.load(open(f)) for f in (f1, f2, f3)]
    qs = list(runs[2]["queries"])
    rows = []
    for q in qs:
        t = [r["queries"].get(q) for r in runs]
        if any(v is None for v in t):
            continue
        rows.append((q, *t, t[2] / t[1] if t[1] else float("nan")))
    rows.sort(key=lambda r: -r[3])
    tot = [sum(r[i] for r in rows) for i in (1, 2, 3)]
    out = [
        f"# Scaling study — round {rnd} headline queries, best-of-3 seconds",
        "",
        f"Same {len(rows)}-query headline set at three data scales (10x "
        "row-count steps).",
        "The informative column is the LAST ratio: a query whose "
        "sf0.01->sf0.1 cost",
        "grows ~<=10x scales linearly in data size (fixed per-query "
        "overhead -",
        "session, planning, streaming-query start/stop - dominates the "
        "small SFs,",
        "which is why sf0.001->sf0.01 ratios hover near 1).",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | x0.01->0.1 |",
        "|---|---|---|---|---|",
    ]
    for q, a, b, c, r in rows:
        out.append(f"| {q} | {a:.2f} | {b:.2f} | {c:.2f} | {r:.1f}x |")
    out.append(f"| **total** | **{tot[0]:.2f}** | **{tot[1]:.2f}** | "
               f"**{tot[2]:.2f}** | **{tot[2]/tot[1]:.1f}x** |")
    path = f"SCALING_r{int(rnd):02d}.md"
    open(path, "w").write("\n".join(out) + "\n")
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
