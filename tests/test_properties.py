"""Property-based differential tests: the façade vs pandas on random data.

The reference's dominant test pattern is differential testing against pandas
(SURVEY §5.1) on fixed fixtures; hypothesis upgrades that to randomized
frames with nulls, duplicates, negatives and mixed signs.  Each example
round-trips one small frame through Spark, so examples are capped and the
deadline disabled (Spark job latency ≫ hypothesis defaults).
"""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pandas_db_spark.table import Table

ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-10**9, max_value=10**9)),
        st.one_of(st.none(),
                  st.floats(min_value=-1e6, max_value=1e6,
                            allow_nan=False, allow_infinity=False)),
        st.one_of(st.none(), st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=8)),
    ),
    min_size=1, max_size=40,
)

PROP_SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


def make_table(spark, rows):
    df = spark.createDataFrame(rows, "i long, f double, s string")
    return Table(df, "prop"), pd.DataFrame(rows, columns=["i", "f", "s"])


@given(rows=ROWS)
@PROP_SETTINGS
def test_counts_and_aggregates_match_pandas(spark, rows):
    t, pdf = make_table(spark, rows)
    for col in ("i", "f", "s"):
        c = t[col]
        s = pdf[col]
        assert len(c) == len(s)
        assert c.count() == s.count()
        assert c.null_count() == s.isna().sum()
        # len == count + null_count (reference tests/test_column.py:60-67)
        assert len(c) == c.count() + c.null_count()
    for col in ("i", "f"):
        c, s = t[col], pdf[col]
        if s.count() == 0:
            assert c.min() is None and c.max() is None
            continue
        assert c.min() == pytest.approx(s.min(), rel=1e-9)
        assert c.max() == pytest.approx(s.max(), rel=1e-9)
        assert c.sum() == pytest.approx(s.sum(), rel=1e-9)
        assert c.avg() == pytest.approx(s.mean(), rel=1e-9)
        assert c.median() == pytest.approx(s.median(), rel=1e-9)


@given(rows=ROWS, threshold=st.integers(min_value=-10**9, max_value=10**9))
@PROP_SETTINGS
def test_filters_match_pandas_and_compose(spark, rows, threshold):
    t, pdf = make_table(spark, rows)
    got = sorted(tuple(r) for r in t[t.i > threshold].data())
    want = sorted(pdf[pdf.i > threshold].itertuples(index=False, name=None))
    assert _rows_eq(got, want)
    # filter-then-filter == combined & filter (reference test_table.py:258)
    both = t[(t.i > threshold) & (t.f < 0)]
    chained = t[t.i > threshold]
    chained = chained[chained.f < 0]
    assert sorted(map(tuple, both.data())) == sorted(map(tuple, chained.data()))
    # filtered ⊆ parent
    assert len(both) <= len(t)


@given(rows=ROWS)
@PROP_SETTINGS
def test_sort_and_distinct_match_pandas(spark, rows):
    t, pdf = make_table(spark, rows)
    got = [r[0] for r in t[["i"]].sort_values("i").data()]
    # NULLs first on ascending sorts (reference utils.py:52-58)
    want = list(pdf["i"].sort_values(na_position="first"))
    assert _vals_eq(got, want)
    assert set(x for x in t.i.unique()) == set(
        pdf["i"].dropna()) | ({None} if pdf["i"].isna().any() else set())
    vc = t.s.value_counts()
    want_vc = pdf["s"].value_counts().to_dict()
    assert {k: v for k, v in vc.items() if k is not None} == want_vc


@given(rows=ROWS, delta=st.integers(min_value=-100, max_value=100))
@PROP_SETTINGS
def test_arithmetic_matches_python(spark, rows, delta):
    t, pdf = make_table(spark, rows)
    got = (t.i + delta).data()
    want = [None if pd.isna(x) else x + delta for x in pdf["i"]]
    assert sorted(_key(v) for v in got) == sorted(_key(v) for v in want)
    got = (t.f * 2).data()
    want = [None if pd.isna(x) else x * 2 for x in pdf["f"]]
    assert sorted(_key(v) for v in got) == sorted(_key(v) for v in want)


def _key(v):
    if v is None:
        return (0, 0.0)
    return (1, float(v))


def _vals_eq(got, want):
    if len(got) != len(want):
        return False
    for g, w in zip(got, want):
        g_null = g is None
        w_null = pd.isna(w)
        if g_null != w_null:
            return False
        if not g_null and not math.isclose(g, w, rel_tol=1e-9):
            return False
    return True


def _rows_eq(got, want):
    return len(got) == len(want) and all(
        all((a is None and pd.isna(b)) or a == b or
            (isinstance(a, float) and math.isclose(a, b, rel_tol=1e-9))
            for a, b in zip(gr, wr))
        for gr, wr in zip(got, want))


@PROP_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2),            # key
                  st.integers(0, 50),           # order position
                  st.integers(-10_000, 10_000)  # value in cents
                  ),
        min_size=1, max_size=40),
    n=st.integers(1, 5),
)
def test_rolling_rows_matches_pandas_property(spark, rows, n):
    """rolling_rows == pandas groupby().rolling() on arbitrary keyed
    series (exact: integer-cents values, unique tiebreak ids)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pandas_db_spark.operators.rolling import rolling_rows

    data = [(i, k, o, c / 100.0) for i, (k, o, c) in enumerate(rows)]
    df = (spark.createDataFrame(
            data, "id long, k long, o long, v double")
          .withColumn("ts", F.timestamp_seconds("o")).drop("o"))
    out = (rolling_rows(df, "k", "ts", "v", n=n, tiebreak_cols=["id"])
           .select("id", "roll_sum", "roll_n").toPandas()
           .set_index("id").sort_index())
    pdf = pd.DataFrame(data, columns=["id", "k", "o", "v"]).sort_values(
        ["k", "o", "id"])
    g = pdf.groupby("k")["v"]
    exp_sum = g.rolling(n, min_periods=1).sum().reset_index(level=0, drop=True)
    exp_n = g.rolling(n, min_periods=1).count().reset_index(level=0, drop=True)
    for rid, s, c in zip(pdf["id"], exp_sum, exp_n):
        assert out.loc[rid, "roll_sum"] == pytest.approx(s, abs=1e-9)
        assert out.loc[rid, "roll_n"] == int(c)


DOC_ROWS = st.lists(
    st.text(alphabet=st.sampled_from("ab cd efg hij k lm nop q rst"
                                     " uv w xyz the of and"),
            min_size=0, max_size=120),
    min_size=1, max_size=25,
)


@given(texts=DOC_ROWS)
@PROP_SETTINGS
def test_bloom_never_misses_property(spark, texts):
    """Property: the Bloom probe can NEVER miss a contaminated doc —
    every doc flagged by the exact broadcast-index path is flagged by
    the Bloom path with at least the same n_shared (false negatives are
    structurally impossible; random corpora probe the hashing, not a
    hand-picked plant)."""
    from pandas_db_spark.operators import decontam as DC

    rows = [(i, t) for i, t in enumerate(texts)]
    half = max(1, len(rows) // 2)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev, tr = df.where(f"doc_id < {half}"), df.where(f"doc_id >= {half}")
    if tr.count() == 0:
        return
    bloom = DC.build_ngram_bloom(ev, m_bits=1 << 16)
    got = {r.train_id: r.n_shared
           for r in DC.bloom_contaminated(tr, bloom).collect()}
    exact = {r.train_id for r in
             DC.contamination_pairs(tr, ev, n=8)
               .select("train_id").distinct().collect()}
    for tid in exact:
        assert tid in got, f"bloom missed contaminated doc {tid}"


@given(texts=DOC_ROWS)
@PROP_SETTINGS
def test_gopher_flags_match_python_reference(spark, texts):
    """Property: every Gopher flag agrees with an independent pure-
    Python computation of the published rules on random text."""
    import re

    from pyspark.sql import functions as F
    from pandas_db_spark.functions.text import (GOPHER_STOPWORDS,
                                                gopher_flags)

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = gopher_flags(F.col("text"))
    got = {}
    for r in df.select("doc_id",
                       *[c.alias(n) for n, c in flags.items()]).collect():
        d = r.asDict(); d.pop("doc_id")
        got[r.doc_id] = d
    for i, t in rows:
        ws = re.split(r"\s+", t.strip())
        n = len(ws)
        sum_wlen = sum(len(w) for w in ws)
        n_hash = t.count("#")
        n_ell = t.count("...")  # non-overlapping, same as replace-count
        n_alpha = len([w for w in ws if re.search("[A-Za-z]", w)])
        n_stop = len(set(ws) & set(GOPHER_STOPWORDS))
        lines = t.split("\n")
        nl = len(lines)
        n_bullet = len([l for l in lines
                        if re.match(r"^(- |\* |•)", l.lstrip())])
        n_ellend = len([l for l in lines
                        if re.search(r"(\.\.\.|…)$", l.rstrip())])
        want = {
            "wc_ok": 50 <= n <= 100_000,
            "wlen_ok": 3 * n <= sum_wlen <= 10 * n,
            "symbol_ok": (n_hash + n_ell) * 10 <= n,
            "alpha_ok": n_alpha * 5 >= n * 4,
            "stop_ok": n_stop >= 2,
            "bullet_ok": n_bullet * 10 <= nl * 9,
            "ellipsis_ok": n_ellend * 10 <= nl * 3,
        }
        want["gopher_keep"] = all(want.values())
        assert got[i] == want, (i, t, got[i], want)
