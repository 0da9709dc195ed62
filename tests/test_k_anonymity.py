"""k-anonymity suppression / redaction (operators/quality.k_anonymize)."""

import pytest


def _df(spark):
    rows = [
        (1, "en", "web"), (2, "en", "web"), (3, "en", "web"),
        (4, "fr", "web"),                       # singleton group
        (5, "en", "book"), (6, "en", "book"),
        (7, None, "web"), (8, None, "web"),     # NULL quasi group of 2
        (9, None, "book"),                      # NULL singleton
    ]
    return spark.createDataFrame(rows, "id long, lang string, src string")


def test_suppress_drops_under_k_groups(spark):
    from pandas_db_spark.operators.quality import k_anonymize

    out = k_anonymize(_df(spark), ["lang", "src"], k=2)
    assert {r["id"] for r in out.collect()} == {1, 2, 3, 5, 6, 7, 8}


def test_null_quasi_values_group_together(spark):
    """Two NULL-lang 'web' rows are ONE group of 2 — they survive k=2;
    the NULL-lang 'book' singleton does not.  A non-null-safe join
    would wrongly drop all three."""
    from pandas_db_spark.operators.quality import k_anonymize

    out = k_anonymize(_df(spark), ["lang", "src"], k=2)
    ids = {r["id"] for r in out.collect()}
    assert {7, 8} <= ids and 9 not in ids


def test_redact_mode_keeps_cardinality(spark):
    from pandas_db_spark.operators.quality import k_anonymize

    out = k_anonymize(_df(spark), ["lang", "src"], k=2, mode="redact")
    rows = {r["id"]: (r["lang"], r["src"]) for r in out.collect()}
    assert len(rows) == 9
    assert rows[4] == ("*", "*")           # singleton redacted
    assert rows[9] == ("*", "*")
    assert rows[1] == ("en", "web")        # big group untouched
    assert rows[7] == (None, "web")        # NULL group of 2 kept as-is


def test_k_one_is_identity_and_validation(spark):
    from pandas_db_spark.operators.quality import k_anonymize

    df = _df(spark)
    assert k_anonymize(df, ["lang"], k=1).count() == 9
    with pytest.raises(ValueError, match="k must be"):
        k_anonymize(df, ["lang"], k=0)
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymize(df, [], k=2)
    with pytest.raises(ValueError, match="mode"):
        k_anonymize(df, ["lang"], k=2, mode="mask")


# ---------------------------------------------------------------------
# k_anonymize_generalize — global recoding over one ladder column
# ---------------------------------------------------------------------

def _ladder_df(spark):
    # values 0..7 with lang split: at level 0 every (lang, v) group is
    # size 1; level 1 (v div 2) gives groups of 2; level 2 groups of 4
    rows = [(i, "en", i % 8) for i in range(8)] + \
           [(100 + i, "fr", i % 8) for i in range(8)]
    return spark.createDataFrame(rows, "id long, lang string, v long")


def test_generalize_picks_minimal_level(spark):
    from pandas_db_spark.operators.quality import k_anonymize_generalize

    out = k_anonymize_generalize(_ladder_df(spark), ["lang"], "v", k=2)
    rows = out.collect()
    assert {r["gen_level"] for r in rows} == {1}
    # level 1: v -> v div 2, so values 0..3
    assert {r["v"] for r in rows} == {0, 1, 2, 3}
    # and the released table IS k-anonymous
    from collections import Counter
    c = Counter((r["lang"], r["v"]) for r in rows)
    assert min(c.values()) >= 2


def test_generalize_level_zero_when_already_anonymous(spark):
    from pandas_db_spark.operators.quality import k_anonymize_generalize

    out = k_anonymize_generalize(_ladder_df(spark), ["lang"], "v", k=1)
    assert {r["gen_level"] for r in out.collect()} == {0}
    assert {r["v"] for r in out.collect()} == set(range(8))


def test_generalize_raises_when_ladder_exhausted(spark):
    from pandas_db_spark.operators.quality import k_anonymize_generalize

    df = spark.createDataFrame(
        [(1, "en", 0), (2, "fr", 0)], "id long, lang string, v long")
    # lang itself splits the table into singletons forever
    with pytest.raises(ValueError, match="no level"):
        k_anonymize_generalize(df, ["lang"], "v", k=2, max_level=3)


def test_generalize_matches_bruteforce_on_skewed_ladder(spark):
    from collections import Counter
    from pandas_db_spark.operators.quality import k_anonymize_generalize

    vals = [0, 1, 2, 3, 8, 9, 40, 41, 42, 43, 44, 45]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, v long")
    k = 3
    want_level = None
    for lv in range(9):
        c = Counter(v // (2 ** lv) for v in vals)
        if min(c.values()) >= k:
            want_level = lv
            break
    # empty quasi list: the ladder column alone defines the groups
    out = k_anonymize_generalize(df, [], "v", k=k)
    got = out.collect()
    assert {r["gen_level"] for r in got} == {want_level}
    assert [r["v"] for r in sorted(got, key=lambda r: r["id"])] == \
        [v // (2 ** want_level) for v in vals]


# ---------------------------------------------------------------------
# l_diversify — distinct-sensitive-value gate
# ---------------------------------------------------------------------

def test_l_diversify_homogeneous_group_dropped(spark):
    from pandas_db_spark.operators.quality import l_diversify

    rows = [
        (1, "en", "flu"), (2, "en", "cold"), (3, "en", "flu"),
        (4, "fr", "flu"), (5, "fr", "flu"),       # homogeneous: l=1
        (6, None, "flu"), (7, None, "cold"),      # NULL group, l=2
        (8, "de", None), (9, "de", "flu"),        # NULL sensitive !count
    ]
    df = spark.createDataFrame(rows, "id long, lang string, dx string")
    out = {r["id"] for r in
           l_diversify(df, ["lang"], "dx", l=2).collect()}
    assert out == {1, 2, 3, 6, 7}      # fr homogeneous; de has 1 non-NULL


def test_l_diversify_validation(spark):
    from pandas_db_spark.operators.quality import l_diversify

    df = spark.createDataFrame([(1, "en", "x")],
                               "id long, lang string, dx string")
    with pytest.raises(ValueError, match="quasi_cols"):
        l_diversify(df, [], "dx", l=2)
    with pytest.raises(ValueError, match="l must be"):
        l_diversify(df, ["lang"], "dx", l=0)


# ---------------------------------------------------------------------
# t_closeness_report — per-group sensitive-distribution TVD
# ---------------------------------------------------------------------

def test_t_closeness_matches_python_replay_with_nulls(spark):
    """NULL quasi group and NULL sensitive value both count as
    categories; every group's integer TVD equals the brute-force
    replay, including the closed-form absent-value mass."""
    from collections import Counter, defaultdict
    from pandas_db_spark.operators.quality import t_closeness_report

    rows = [(1, "en", "a"), (2, "en", "a"), (3, "en", "b"),
            (4, "fr", "a"), (5, "fr", "c"), (6, None, "b"),
            (7, None, None), (8, "de", "a")]
    df = spark.createDataFrame(rows, "id long, lang string, sv string")
    got = {r["lang"]: (r["tvd_num"], r["n_group"], r["n_total"])
           for r in t_closeness_report(df, ["lang"], "sv").collect()}
    n = len(rows)
    corpus = Counter(r[2] for r in rows)
    groups = defaultdict(list)
    for r in rows:
        groups[r[1]].append(r[2])
    want = {}
    for g, vs in groups.items():
        cg = Counter(vs)
        want[g] = (sum(abs(cg.get(v, 0) * n - corpus[v] * len(vs))
                       for v in corpus), len(vs), n)
    assert got == want


def test_t_closeness_uniform_group_is_zero(spark):
    """A group whose distribution equals the corpus's exactly has
    integer TVD 0 — the report's fixed point."""
    from pandas_db_spark.operators.quality import t_closeness_report

    rows = [(i, "g1", ["a", "b"][i % 2]) for i in range(4)] + \
           [(10 + i, "g2", ["a", "b"][i % 2]) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, grp string, sv string")
    out = {r["grp"]: r["tvd_num"]
           for r in t_closeness_report(df, ["grp"], "sv").collect()}
    assert out == {"g1": 0, "g2": 0}


def test_t_closeness_validation(spark):
    from pandas_db_spark.operators.quality import t_closeness_report

    df = spark.createDataFrame([(1, "en", "x")],
                               "id long, lang string, sv string")
    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_report(df, [], "sv")
