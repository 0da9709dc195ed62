"""Blocked fuzzy record linkage (operators/linkage.py): exact
within-block distances, blocking-miss semantics, the hot-key cap
contract, and the self-pair halving."""

import pytest
from pyspark.sql import functions as F

from pandas_db_spark.operators.linkage import fuzzy_join, fuzzy_self_pairs


def _left(spark):
    return spark.createDataFrame(
        [(1, "jon smith"), (2, "john smith"), (3, "mary jones"),
         (4, None), (5, "jon smyth")],
        "id long, name string")


def _right(spark):
    return spark.createDataFrame(
        [(10, "john smith"), (11, "marie jones"), (12, "bob stone"),
         (13, None)],
        "rid long, rname string")


def test_fuzzy_join_blocked_levenshtein(spark):
    """Block on the first character: 'jon smith'~'john smith' (d=1)
    and 'jon smyth'~'john smith' (d=2) link; 'mary jones'~'marie
    jones' (d=2) links in the m-block; NULLs never match."""
    out = fuzzy_join(_left(spark), _right(spark), "name", "rname",
                     "id", "rid",
                     F.substring("name", 1, 1),
                     F.substring("rname", 1, 1), max_dist=2)
    got = {(r["id"], r["rid"]): r["dist"] for r in out.collect()}
    assert got == {(1, 10): 1, (2, 10): 0, (5, 10): 2, (3, 11): 2}


def test_fuzzy_join_blocking_miss_is_the_contract(spark):
    """'bob stone' is distance 8 from 'jon smith' — under max_dist=9 a
    CROSS comparison would link them, but their blocks differ, so they
    are never compared: blocking recall is the caller's key choice."""
    out = fuzzy_join(_left(spark), _right(spark), "name", "rname",
                     "id", "rid",
                     F.substring("name", 1, 1),
                     F.substring("rname", 1, 1), max_dist=9)
    assert (1, 12) not in {(r["id"], r["rid"]) for r in out.collect()}


def test_fuzzy_join_matches_duckdb(spark, db, duck):
    """sf0.001 cross-table linkage equals the SQL replay value-for-value
    (the driver-gate compare, locally)."""
    got = {(r["c_custkey"], r["s_suppkey"]): r["dist"]
           for r in fuzzy_join(
               db.customer.df, db.supplier.df, "c_name", "s_name",
               "c_custkey", "s_suppkey",
               F.substring("c_name", -4, 4),
               F.substring("s_name", -4, 4), max_dist=5).collect()}
    want = {(c, s): d for c, s, d in duck.execute(
        "SELECT c_custkey, s_suppkey, levenshtein(c_name, s_name) "
        "FROM customer c JOIN supplier s "
        "ON right(c_name, 4) = right(s_name, 4) "
        "WHERE levenshtein(c_name, s_name) <= 5").fetchall()}
    assert got == want and len(got) > 0


def test_fuzzy_join_hot_block_cap_warns_and_drops(spark):
    """A degenerate blocking key ('', the empty-name bucket) beyond
    max_block is excluded with a warning; selective keys still link."""
    import warnings as W

    left = spark.createDataFrame(
        [(i, f"x{i}", "") for i in range(5)] + [(9, "abc", "k")],
        "id long, name string, blk string")
    right = spark.createDataFrame(
        [(20, "abd", "k"), (21, "zzz", "")],
        "rid long, rname string, rblk string")
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        out = fuzzy_join(left, right, "name", "rname", "id", "rid",
                         "blk", "rblk", max_dist=3,
                         max_block=3).collect()
    assert any("excluded from comparison" in str(w.message)
               for w in caught)
    assert {(r["id"], r["rid"]) for r in out} == {(9, 20)}
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(left, right, "name", "rname", "id", "rid",
                   "blk", "rblk", max_dist=-1)


def test_fuzzy_self_pairs_halves_and_orders(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "abce"), (3, "abcf"), (4, "zzzz")],
        "doc long, t string")
    out = fuzzy_self_pairs(df, "t", "doc", F.substring("t", 1, 2),
                           max_dist=1)
    assert out.columns == ["id_a", "id_b", "dist"]
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_fuzzy_join_reserved_name_guard(spark):
    """ADVICE r12: inputs already carrying the operator's internal
    column names are refused loudly instead of resolving ambiguously."""
    left = spark.createDataFrame([(1, "abc", "k", 9)],
                                 "id long, name string, k string, __bk long")
    right = spark.createDataFrame([(2, "abd", "k")],
                                  "id long, name string, k string")
    from pandas_db_spark.operators.linkage import fuzzy_join
    with pytest.raises(ValueError, match="reserved"):
        fuzzy_join(left, right, "name", "name", "id", "id",
                   "k", "k", max_dist=2)


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking (r13)


def _snp_py(rows, window, max_dist=None):
    """Python replay: rows = [(id, key, text)]."""
    import difflib  # noqa: F401  (documentation only; we use real DP below)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, _, ta) in enumerate(ranked):
        for g in range(1, window):
            if i + g >= len(ranked):
                break
            idb, _, tb = ranked[i + g]
            if max_dist is None:
                out.add((ida, idb, g))
            else:
                d = lev(ta, tb)
                if d <= max_dist:
                    out.add((ida, idb, g, d))
    return out


def test_sorted_neighborhood_matches_python_replay(spark):
    rows = [(i, f"k{(i * 17) % 23:02d}", f"name{(i * 7) % 10}x{i % 3}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, k string, t string")
    from pandas_db_spark.operators.linkage import sorted_neighborhood_pairs

    got = {tuple(r) for r in sorted_neighborhood_pairs(
        df, "k", "id", window=4).collect()}
    assert got == _snp_py(rows, 4)
    got_v = {tuple(r) for r in sorted_neighborhood_pairs(
        df, "k", "id", window=4, text_col="t", max_dist=2).collect()}
    assert got_v == _snp_py(rows, 4, max_dist=2)
    assert got_v  # the verified set is non-trivial


def test_sorted_neighborhood_catches_key_typos_hash_blocking_misses(spark):
    """The motivating property: a trailing-char typo in the BLOCKING key
    breaks equality blocking but not sort adjacency."""
    from pandas_db_spark.operators.linkage import (fuzzy_self_pairs,
                                                   sorted_neighborhood_pairs)

    rows = [(1, "smith", "jon smith"), (2, "smitj", "john smith"),
            (3, "adams", "ada adams"), (4, "zzzzz", "unrelated")]
    df = spark.createDataFrame(rows, "id long, k string, t string")
    hash_pairs = {(r["id_a"], r["id_b"]) for r in fuzzy_self_pairs(
        df, "t", "id", F.col("k"), max_dist=3).collect()}
    assert (1, 2) not in hash_pairs  # equality blocking misses the typo
    snp = {(r["id_a"], r["id_b"]) for r in sorted_neighborhood_pairs(
        df, "k", "id", window=2, text_col="t", max_dist=3).collect()}
    assert (1, 2) in snp             # sort adjacency recovers it


def test_sorted_neighborhood_partition_invariant_and_validated(spark):
    from pandas_db_spark.operators.linkage import sorted_neighborhood_pairs

    rows = [(i, f"k{(i * 5) % 11}", "t") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, k string, t string")
    one = {tuple(r) for r in sorted_neighborhood_pairs(
        df.coalesce(1), "k", "id", window=3).collect()}
    many = {tuple(r) for r in sorted_neighborhood_pairs(
        df.repartition(13), "k", "id", window=3).collect()}
    assert one == many
    # NULL keys are excluded
    with_null = df.union(spark.createDataFrame(
        [(99, None, "t")], "id long, k string, t string"))
    got = {tuple(r) for r in sorted_neighborhood_pairs(
        with_null, "k", "id", window=3).collect()}
    assert got == one
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "k", "id", window=1)
    with pytest.raises(ValueError, match="together"):
        sorted_neighborhood_pairs(df, "k", "id", text_col="t")
    with pytest.raises(ValueError, match="max_dist"):
        sorted_neighborhood_pairs(df, "k", "id", text_col="t",
                                  max_dist=-1)
