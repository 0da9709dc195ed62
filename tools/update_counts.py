"""Regenerate the README + COVERAGE.md driver-contract counts from the
registry.

VERDICT r11 #3 (README) and r12 Next #7 (COVERAGE.md): per-round
query/oracle counts were hand-edited in several prose locations and
could silently go stale.  This script makes them correct BY
CONSTRUCTION: it derives the registry totals from
``pandas_db_spark.queries`` (the single source of truth), reads the
newest ``LOCAL_CORRECTNESS_r{N}.json`` receipt, cross-checks the two,
and rewrites (a) the count-bearing phrases in README.md in place and
(b) the auto-managed summary block between the ``counts:begin`` /
``counts:end`` markers at the end of COVERAGE.md.  Run it as part of
every receipts refresh:

    python tools/update_counts.py            # rewrite + report
    python tools/update_counts.py --check    # exit 1 on any drift

Every substitution pattern must match EXACTLY once; a missing pattern
or marker exits 1 so prose drift is loud, never silent.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_counts() -> tuple[int, int, int]:
    sys.path.insert(0, ROOT)
    from pandas_db_spark.queries import REGISTRY
    total = len(REGISTRY)
    with_oracle = sum(1 for _, sql in REGISTRY.values() if sql is not None)
    return total, with_oracle, total - with_oracle


def newest_local_receipt() -> tuple[str, dict]:
    paths = [p for p in glob.glob(os.path.join(
        ROOT, "LOCAL_CORRECTNESS_r*.json")) if "_sf" not in p]
    if not paths:
        raise SystemExit("no LOCAL_CORRECTNESS_r*.json receipt found")
    best = max(paths, key=lambda p: int(
        re.search(r"_r(\d+)\.json$", p).group(1)))
    with open(best) as f:
        return os.path.basename(best), json.load(f)


def receipt_counts(data: dict) -> tuple[int, int, int, int]:
    s = data["summary"]
    return (int(s["pass"]), int(s["fail"]), int(s["rows_only"]),
            len(data["results"]))


def substitute(text: str, pattern: str, repl: str) -> str:
    out, n = re.subn(pattern, repl, text, count=1)
    if n != 1:
        raise SystemExit(f"pattern not found in README.md: {pattern!r}")
    return out


COVERAGE_BEGIN = ("<!-- counts:begin — auto-managed by "
                  "tools/update_counts.py; do not hand-edit -->")
COVERAGE_END = "<!-- counts:end -->"


def coverage_block(total: int, with_oracle: int, rows_only: int,
                   fname: str, n_pass: int, n_fail: int,
                   n_ro: int) -> str:
    return (f"{COVERAGE_BEGIN}\n"
            f"Current registry: **{total} queries** — {with_oracle} "
            f"with oracle SQL, {rows_only} rows-only by design.\n"
            f"Newest full local receipt `{fname}`: "
            f"**{n_pass} pass, {n_fail} fail, {n_ro} rows-only**.\n"
            f"{COVERAGE_END}")


def rewrite_coverage(total, with_oracle, rows_only, fname, n_pass,
                     n_fail, n_ro) -> tuple[str, str, str]:
    """Returns (path, current_text, updated_text)."""
    path = os.path.join(ROOT, "COVERAGE.md")
    with open(path) as f:
        text = f.read()
    pattern = (re.escape(COVERAGE_BEGIN) + r".*?"
               + re.escape(COVERAGE_END))
    block = coverage_block(total, with_oracle, rows_only, fname,
                           n_pass, n_fail, n_ro)
    updated, n = re.subn(pattern, block, text, count=1, flags=re.S)
    if n != 1:
        raise SystemExit(
            "COVERAGE.md is missing the auto-managed counts markers "
            f"({COVERAGE_BEGIN!r} .. {COVERAGE_END!r}) — re-add the "
            "block at the end of the file")
    return path, text, updated


def main() -> int:
    check = "--check" in sys.argv
    total, with_oracle, rows_only = registry_counts()
    fname, data = newest_local_receipt()
    n_pass, n_fail, n_ro, n_covered = receipt_counts(data)
    print(f"registry: {total} queries, {with_oracle} with oracle SQL, "
          f"{rows_only} rows-only by design")
    print(f"{fname}: {n_pass} pass, {n_fail} fail, {n_ro} rows-only")
    if n_covered != total:
        print(f"WARNING: receipt covers {n_covered} of {total} registry "
              "queries — rerun tools/verify_correctness.py for a full "
              "receipt before updating counts")

    readme_path = os.path.join(ROOT, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    updated = substitute(
        readme,
        r"`queries\(\)` \(\d+ named queries,",
        f"`queries()` ({total} named queries,")
    updated = substitute(
        updated,
        r"SQL for \d+ of them; the \d+ genuinely",
        f"SQL for {with_oracle} of them; the {rows_only} genuinely")
    updated = substitute(
        updated,
        r"\(`LOCAL_CORRECTNESS_r\d+\.json`: \d+ pass, \d+ fail, "
        r"\d+ rows-only by design\)",
        f"(`{fname}`: {n_pass} pass, {n_fail} fail, "
        f"{n_ro} rows-only by design)")
    cov_path, cov_text, cov_updated = rewrite_coverage(
        total, with_oracle, rows_only, fname, n_pass, n_fail, n_ro)

    stale = []
    if updated != readme:
        stale.append(("README.md", readme_path, updated))
    if cov_updated != cov_text:
        stale.append(("COVERAGE.md", cov_path, cov_updated))
    if not stale:
        print("README.md + COVERAGE.md: counts already current")
        return 0
    if check:
        for name, _, _ in stale:
            print(f"{name}: counts STALE (run without --check to rewrite)")
        return 1
    for name, path, text in stale:
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: counts rewritten")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
