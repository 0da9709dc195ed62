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


# ---------------------------------------------------------------------
# Scale oracles (r8 — VERDICT r7 #5): the four transitive-closure dedup
# queries register a recursive-CTE oracle that is exact but intractable
# beyond sf0.01 (the all-pairs shingle join is n², the `reach` CTE
# quadratic in chain length — >20 min at sf0.1 vs 16 s for Spark).
# These equivalents compute the SAME components: an inverted-index
# set-similarity join (cost Σ df² over shingles, 1.8 s at sf0.1) yields
# the identical ≥0.8-jaccard edge set — any pair at jaccard ≥ 0.8 shares
# a shingle, so no candidate is missed — then a driver union-find labels
# each node with its component minimum, and the ORIGINAL final SELECT
# runs over the materialized `cc` (tails copied verbatim from
# queries.py).  Equivalence to the recursive oracle is asserted at
# sf0.01 by tests/test_graph.py::test_matches_recursive_closure_on_real_pairs
# and by this tool agreeing with the driver's r4-r7 receipts.

_CC_PAIRS_SQL = """
WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
s AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3 THEN
 [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)]
 ELSE [array_to_string(ws, ' ')] END) AS sh FROM w),
sizes AS (SELECT doc_id, len(sh) AS n FROM s),
inv AS (SELECT doc_id, unnest(sh) AS g FROM s),
cand AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS inter
         FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT u, v FROM cand
JOIN sizes sa ON sa.doc_id = u JOIN sizes sb ON sb.doc_id = v
WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.8
"""

SCALE_ORACLE_TAILS = {
    "dedup_components": "SELECT id, component FROM cc",
    "dedup_keep_components":
        "SELECT doc_id FROM documents "
        "WHERE doc_id NOT IN (SELECT id FROM cc WHERE id != component)",
    "dedup_cluster_stats":
        "SELECT cluster_size, count(*) AS n_clusters FROM ("
        "SELECT component, count(*) AS cluster_size FROM cc GROUP BY 1) "
        "GROUP BY 1",
    "dedup_keep_best":
        "WITH mem AS (SELECT cc.component, cc.id, len(d.text) AS l "
        "FROM cc JOIN documents d ON cc.id = d.doc_id), "
        "rk AS (SELECT id, row_number() OVER (PARTITION BY component "
        "ORDER BY l DESC, id) AS rn FROM mem) "
        "SELECT doc_id FROM documents "
        "WHERE doc_id NOT IN (SELECT id FROM rk WHERE rn > 1)",
}


def _register_cc(con) -> None:
    """Materialize the connected-component labels as a `cc` relation
    (id, component-min) — union-by-min + path compression, near-linear
    in edge count."""
    edges = con.execute(_CC_PAIRS_SQL).fetchall()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    cc = pd.DataFrame([(x, find(x)) for x in parent],
                      columns=["id", "component"]).astype("int64")
    con.register("cc", cc)


_cc_registered_cons: set[int] = set()


def scale_oracle(con, name: str) -> pd.DataFrame | None:
    if name not in SCALE_ORACLE_TAILS:
        return None
    if id(con) not in _cc_registered_cons:
        _register_cc(con)
        _cc_registered_cons.add(id(con))
    return con.execute(SCALE_ORACLE_TAILS[name]).fetchdf()


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
            ddf = scale_oracle(con, name)
            if ddf is None:
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
