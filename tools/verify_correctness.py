"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the same query on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value frame.
Floats compare with a tiny relative tolerance *for diagnosis*, but exact
mismatches are reported so they can be driven to bit-equality (the real
driver hashes values).

Usage:  python tools/verify_correctness.py [sf_dir] [query ...]
        python tools/verify_correctness.py [sf_dir] --json OUT.json
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values, sort rows — the
    order-insensitive shape the driver hashes."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda x: repr(x))
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]").astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    for c in sorted(spark_pdf.columns):
        da, db = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        if da != db:
            problems.append(f"dtype {c}: spark={da} duck={db}")
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            exact = np.array_equal(av, bv, equal_nan=True)
            if not exact:
                close = np.allclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
                bad = np.where(~np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True))[0][:3]
                problems.append(
                    f"col {c}: float mismatch (close={close}) "
                    f"first_bad_idx={bad.tolist()} "
                    f"spark={av[bad].tolist()} duck={bv[bad].tolist()}")
        else:
            if not (av == bv).all():
                bad = np.where(av != bv)[0][:3]
                problems.append(
                    f"col {c}: mismatch at {bad.tolist()} "
                    f"spark={av[bad].tolist()} duck={bv[bad].tolist()}")
    return problems


def main() -> int:
    import json
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: verify_correctness.py [sf_dir] [query ...] "
                  "--json OUT.json", file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as ent
    from pandas_db_spark.session import get_spark

    spark = get_spark()
    con = duck_con(sf_dir)
    qs, oracles = ent.queries(), ent.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            results[name] = {"status": "FAIL", "err": "spark error"}
            n_fail += 1
            continue
        secs = round(time.time() - t0, 1)
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows  [{secs}s]")
            results[name] = {"status": "ROWS-ONLY", "spark_rows": len(sdf),
                             "secs": secs}
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            results[name] = {"status": "FAIL", "err": "duckdb error"}
            n_fail += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = {"status": "FAIL", "spark_rows": len(sdf),
                             "oracle_rows": len(ddf), "problems": problems}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)  [{secs}s]")
            results[name] = {"status": "PASS", "spark_rows": len(sdf),
                             "oracle_rows": len(ddf), "secs": secs,
                             "rows_match": True, "schema_match": True,
                             "values_match": True}
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "summary": {"pass": n_pass, "fail": n_fail,
                                   "rows_only": n_rows_only},
                       "results": results}, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
