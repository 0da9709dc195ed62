"""Column contract tests (reference model: tests/test_column.py) —
differential against pandas as oracle, matching the reference's dominant test
pattern (SURVEY.md §5.1)."""

import math

import pytest

from pandas_db_spark import Column


@pytest.fixture(scope="module")
def price(db):
    return db.orders.o_totalprice


@pytest.fixture(scope="module")
def price_s(price):
    return price.to_series()


@pytest.fixture(scope="module")
def status(db):
    return db.orders.o_orderstatus


def test_len_count_null_invariant(db):
    # len == count() + null_count() — reference tests/test_column.py:60-67
    for col in (db.orders.o_totalprice, db.events.value, db.documents.text):
        assert col.len == col.count() + col.null_count()


def test_types(db):
    assert db.orders.o_totalprice.type is float
    assert db.orders.o_orderkey.type is int
    assert db.orders.o_orderstatus.type is str
    assert db.orders.o_totalprice.sql_type == "double"
    assert db.orders.o_totalprice.data_is_numeric()
    assert not db.orders.o_orderstatus.data_is_numeric()


def test_min_max_sum_avg_vs_pandas(price, price_s):
    assert price.min() == price_s.min()
    assert price.max() == price_s.max()
    assert round(price.sum(), 4) == round(price_s.sum(), 4)
    assert round(price.avg(), 4) == round(price_s.mean(), 4)


def test_min_max_text_lexicographic(status):
    s = status.to_series()
    assert status.min() == s.min()
    assert status.max() == s.max()


def test_numeric_gate(status):
    for op in ("sum", "avg", "median"):
        with pytest.raises(TypeError):
            getattr(status, op)()


def test_median_odd_even(price, price_s):
    # odd/even via limit — reference tests/test_column.py:121-140
    assert price.median() == pytest.approx(price_s.median())
    assert price.limit(5).median() == pytest.approx(price_s.head(5).median())
    assert price.limit(4).median() == pytest.approx(price_s.head(4).median())


def test_mode_vs_pandas(db):
    col = db.lineitem.l_returnflag
    modes = col.mode()
    pd_modes = col.to_series().mode()
    assert set(modes) == set(pd_modes)
    vc = col.to_series().value_counts()
    assert all(cnt == vc.max() for cnt in modes.values())


def test_mode_max_ties_valve(spark, db):
    """r13 (VERDICT r12 #8): a near-unique column (every value tied at
    count 1) raises instead of collecting the whole column; raising the
    valve deliberately restores the collect, and real-tie columns are
    untouched by the default."""
    sdf = spark.createDataFrame([(i,) for i in range(50)], "v long")
    col = Column(sdf, "v", "t")
    with pytest.raises(ValueError, match="max_ties"):
        col.mode(max_ties=10)
    assert len(col.mode(max_ties=50)) == 50  # deliberate override
    # default untouched for genuinely-modal columns
    assert set(db.lineitem.l_returnflag.mode()) \
        == set(db.lineitem.l_returnflag.to_series().mode())


def test_unique_set_equality(db):
    col = db.orders.o_orderpriority
    assert set(col.unique()) == set(col.to_series().unique())


def test_unique_includes_null(spark, db):
    sdf = spark.createDataFrame([("a",), (None,), ("a",)], "v string")
    col = Column(sdf, "v", "t")
    assert set(col.unique()) == {"a", None}
    assert col.null_count() == 1


def test_value_counts_vs_pandas(db):
    col = db.orders.o_orderpriority
    vc = col.value_counts()
    expected = col.to_series().value_counts().to_dict()
    assert vc == expected
    counts = list(vc.values())
    assert counts == sorted(counts, reverse=True)


def test_describe_numeric_vs_pandas(price, price_s):
    d = price.describe()
    assert d["len"] == len(price_s)
    assert d["count"] == price_s.count()
    assert d["min"] == price_s.min()
    assert d["max"] == price_s.max()
    assert round(d["sum"], 4) == round(price_s.sum(), 4)
    assert round(d["avg"], 4) == round(price_s.mean(), 4)
    assert d["median"] == pytest.approx(price_s.median())


def test_describe_text(status):
    d = status.describe()
    assert set(d) == {"len", "count", "min", "max", "unique"}
    assert d["unique"] == status.to_series().nunique()


def test_comparison_filters_vs_pandas(price, price_s):
    for thresh in (100000.0, 300000.0):
        assert price[price > thresh].len == (price_s > thresh).sum()
        assert price[price >= thresh].len == (price_s >= thresh).sum()
        assert price[price < thresh].len == (price_s < thresh).sum()
        assert price[price <= thresh].len == (price_s <= thresh).sum()


def test_eq_none_is_null(db):
    col = db.documents.text
    assert col[col == None].len == col.null_count()  # noqa: E711
    assert col[col != None].len == col.count()  # noqa: E711


def test_isin_between(db):
    pri = db.orders.o_orderpriority
    s = pri.to_series()
    assert pri[pri.isin(["1-URGENT", "5-LOW"])].len == s.isin(["1-URGENT", "5-LOW"]).sum()

    price = db.orders.o_totalprice
    ps = price.to_series()
    assert price[price.between(50000, 100000)].len == ps.between(50000, 100000).sum()


def test_like_case_insensitive(db):
    # SQLite LIKE is case-insensitive — reference tests/test_column.py:685-695
    seg = db.customer.c_mktsegment
    upper = seg[seg.like("BUIL%")].len
    lower = seg[seg.like("buil%")].len
    assert upper == lower > 0


def test_contains(db):
    names = db.region.r_name
    some = names.data(limit=1)[0]
    assert some in names
    assert "definitely-not-a-region" not in names


def test_not_null(db, spark):
    sdf = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    col = Column(sdf, "v", "t")
    assert col.not_null().len == 2


def test_sort_values_nulls_first_asc(spark):
    sdf = spark.createDataFrame([(3,), (None,), (1,)], "v int")
    col = Column(sdf, "v", "t")
    assert col.sort_values().data() == [None, 1, 3]
    assert col.sort_values(ascending=False).data() == [3, 1, None]


def test_limit_equals_iloc_slice(price):
    # limit(i) == iloc[:i] — reference tests/test_column.py:369-379
    assert price.limit(10).data() == price.iloc[:10]


def test_apply_ignore_na(spark):
    sdf = spark.createDataFrame([("ab",), (None,), ("c",)], "v string")
    col = Column(sdf, "v", "t")
    assert list(col.apply(len, returnType="long")) == [2, None, 1]
    out = list(col.apply(lambda x: -1 if x is None else len(x),
                         ignore_na=False, returnType="long"))
    assert out == [2, -1, 1]
    # NULL passthrough must also hold for numeric dtypes, where Arrow delivers
    # NaN instead of None (ADVICE r1: pd.isna, not `is None`).
    ndf = spark.createDataFrame([(1.5,), (None,), (2.5,)], "v double")
    ncol = Column(ndf, "v", "t")
    assert list(ncol.apply(lambda x: x * 2, returnType="double")) == [3.0, None, 5.0]


def test_apply_with_args(db):
    col = db.region.r_name
    padded = list(col.apply(str.ljust, args=(12,)))
    assert all(len(p) == 12 for p in padded)


def test_arithmetic_scalar_vs_pandas(price, price_s):
    doubled = (price * 2).data()
    assert doubled == pytest.approx((price_s * 2).tolist())
    plus = (price + 10).data()
    assert plus == pytest.approx((price_s + 10).tolist())
    halves = (price / 2).data()
    assert halves == pytest.approx((price_s / 2).tolist())
    floors = (price // 1000).data()
    assert floors == [math.floor(x / 1000) for x in price_s]


def test_arithmetic_column_operand(db):
    li = db.lineitem
    revenue = (li.l_extendedprice * (li.l_discount * -1 + 1)).data(20)
    pdf = li[["l_extendedprice", "l_discount"]].to_df().head(20)
    expected = (pdf.l_extendedprice * (1 - pdf.l_discount)).tolist()
    assert revenue == pytest.approx(expected)


def test_arithmetic_string_concat(status):
    out = (status + "!").data(5)
    assert all(x.endswith("!") for x in out)


def test_arithmetic_iterable_strict_zip(db):
    col = db.region.r_name
    n = col.len
    gen = col + [f"_{i}" for i in range(n)]
    out = list(gen)
    assert len(out) == n
    with pytest.raises(ValueError):
        list(col + ["too", "short"])


def test_null_preserved_in_arithmetic(spark):
    sdf = spark.createDataFrame([(1.0,), (None,), (3.0,)], "v double")
    col = Column(sdf, "v", "t")
    assert (col + 1).data() == [2.0, None, 4.0]


def test_column_iloc_contract(price, price_s):
    assert price.iloc[0] == price_s.iloc[0]
    assert price.iloc[-1] == price_s.iloc[-1]
    assert price.iloc[[3, 3, -2]] == [price_s.iloc[3], price_s.iloc[3], price_s.iloc[-2]]
    with pytest.raises(IndexError):
        price.iloc[len(price_s)]


def test_hashable(db):
    assert {db.orders.o_totalprice: 1}
