"""Regenerate PLAN_AUDIT_r{N}.md: the 100 TB plan checklist for every
bench headline query, plus a full-registry Python-in-hot-path sweep.

Usage: python tools/plan_audit.py [round_number]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "6"
    sf_dir = "/root/testdata/sf0.01"

    from pandas_db_spark.session import get_spark
    from pandas_db_spark.queries import REGISTRY
    from pandas_db_spark.plans.explain import plan_report
    from bench import HEADLINE

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        f"# Plan audit — round {rnd} headline queries (sf0.01 plans)",
        "",
        "Generated with `tools/plan_audit.py` via "
        "`pandas_db_spark.plans.explain.plan_report` — the",
        "100 TB checklist per query: shuffle count (broadcast exchanges",
        "excluded), broadcast joins, filters reaching the scan, scan-level",
        "column pruning, and Python-in-the-hot-path counts (BatchEvalPython",
        "must be 0 everywhere; ArrowEvalPython marks the justified numpy",
        "batch UDFs of the LSH family).  Streaming queries return their",
        "sink table, so their plan is the drained sink scan.",
        "",
        "| query | shuffles | bcast joins | pushed filters | read cols "
        "| py UDFs | arrow |",
        "|---|---|---|---|---|---|---|",
    ]
    py_offenders = []
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        try:
            r = plan_report(fn(spark, sf_dir))
        except Exception as exc:
            lines.append(f"| {name} | ERROR: {exc!r} | | | | | |")
            continue
        lines.append(
            f"| {name} | {r['shuffles']} | {r['broadcast_joins']} "
            f"| {len(r['pushed_filters'])} | {len(set(r['read_columns']))} "
            f"| {r['python_udfs']} | {r['arrow_evals']} |")
        if r["python_udfs"]:
            py_offenders.append(name)

    lines += [
        "",
        f"BatchEvalPython in headline plans: "
        f"{py_offenders or 'none'} (must stay empty).",
        "",
        "Full-registry sweep: run "
        "`python tools/verify_correctness.py` for execution-level "
        "evidence; this audit is the plan-shape complement.",
        "",
    ]
    out = f"PLAN_AUDIT_r0{rnd}.md" if len(rnd) == 1 else f"PLAN_AUDIT_r{rnd}.md"
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out} ({len(HEADLINE)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
