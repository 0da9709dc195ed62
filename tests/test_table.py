"""Table contract tests (reference model: tests/test_table.py) — differential
against pandas on the same data, plus metamorphic invariants."""

import pandas as pd
import pytest

from pandas_db_spark import Table
from pandas_db_spark.exceptions import InvalidColumnError


@pytest.fixture(scope="module")
def orders(db):
    return db.orders


@pytest.fixture(scope="module")
def orders_pdf(orders):
    return orders.to_df()


def test_shape_and_columns(orders, orders_pdf):
    assert orders.shape == orders_pdf.shape
    assert orders.columns == list(orders_pdf.columns)


def test_data_and_limit(orders, orders_pdf):
    assert len(orders.data(limit=7)) == 7
    row = orders.data(limit=1)[0]
    assert isinstance(row, tuple)
    assert len(row) == len(orders.columns)


def test_column_slice(orders):
    sliced = orders[["o_orderkey", "o_totalprice"]]
    assert isinstance(sliced, Table)
    assert sliced.columns == ["o_orderkey", "o_totalprice"]
    assert sliced.len == orders.len
    with pytest.raises(InvalidColumnError):
        orders[["o_orderkey", "nope"]]


def test_getitem_type_errors(orders):
    with pytest.raises(TypeError):
        orders[42]
    with pytest.raises(KeyError):
        orders["nope"]


def test_filter_subset_invariant(orders, orders_pdf):
    filtered = orders[orders.o_totalprice > 300000]
    expected = (orders_pdf.o_totalprice > 300000).sum()
    assert filtered.len == expected
    assert 0 < filtered.len < orders.len


def test_filter_chain_equals_combined(orders):
    # filter-then-filter == & — reference tests/test_table.py:258-262
    a = orders[orders.o_orderstatus == "F"][  # type: ignore[index]
        orders.o_totalprice > 100000
    ]
    b = orders[(orders.o_orderstatus == "F") & (orders.o_totalprice > 100000)]
    assert a.len == b.len


def test_cross_table_expression_rejected(db, orders):
    with pytest.raises(ValueError):
        orders.filter(db.customer.c_acctbal > 0)


def test_sort_values_forms(orders, orders_pdf):
    top = orders.sort_values("o_totalprice", ascending=False).data(1)[0]
    assert top[3] == orders_pdf.o_totalprice.max()

    multi = orders.sort_values({"o_orderstatus": "ASC", "o_totalprice": "DESC"})
    first = multi.data(1)[0]
    pdf_sorted = orders_pdf.sort_values(
        ["o_orderstatus", "o_totalprice"], ascending=[True, False]
    )
    assert first[0] == pdf_sorted.iloc[0].o_orderkey

    with pytest.raises(InvalidColumnError):
        orders.sort_values("nope")
    with pytest.raises(ValueError):
        orders.sort_values({"o_totalprice": "sideways"})
    with pytest.raises(TypeError):
        orders.sort_values(42)


def test_limit_then_len(orders):
    assert orders.limit(25).len == 25
    assert orders.limit(10**9).len == orders.len


def test_sample_exact_n(orders):
    assert orders.sample(7).len == 7
    # Two samples should (overwhelmingly) differ — reference test_table.py:118-125
    s1 = orders.sample(20).data()
    s2 = orders.sample(20).data()
    assert s1 != s2


def test_iloc_int_negative_and_oob(orders, orders_pdf):
    first = orders.iloc[0]
    assert first == tuple(orders_pdf.iloc[0])
    last = orders.iloc[-1]
    assert last == tuple(orders_pdf.iloc[-1])
    with pytest.raises(IndexError):
        orders.iloc[orders.len]
    with pytest.raises(TypeError):
        orders.iloc["x"]


def test_iloc_slice_and_list(orders, orders_pdf):
    rows = orders.iloc[2:6]
    assert rows == [tuple(r) for _, r in orders_pdf.iloc[2:6].iterrows()]
    picked = orders.iloc[[5, 1, 5, -1]]
    assert picked[0] == picked[2]
    assert picked[1] == tuple(orders_pdf.iloc[1])
    assert orders.iloc[3:3] == []


def test_iter_streams_rows(orders):
    it = iter(orders)
    row = next(it)
    assert isinstance(row, tuple) and len(row) == len(orders.columns)


def test_equals(db, orders):
    assert orders.equals(db["orders"])
    assert not orders.equals(orders.limit(5))
    with pytest.raises(TypeError):
        orders.equals("nope")


def test_applymap(db):
    region = db.region
    rows = list(region.applymap(lambda x: str(x).upper()))
    assert len(rows) == region.len
    assert all(isinstance(r, tuple) for r in rows)


def test_repr_head_tail(orders):
    rdf = orders._repr_df()
    assert len(rdf) == 20
    assert rdf.index[0] == 0
    assert rdf.index[-1] == orders.len - 1


def test_describe_keys(db):
    desc = db.supplier.describe()
    assert set(desc) == set(db.supplier.columns)
    # exact reference key set (reference column.py:251-271) — no extras
    assert set(desc["s_acctbal"]) == {"len", "count", "min", "max", "sum", "avg", "median"}
    assert set(desc["s_name"]) == {"len", "count", "min", "max", "unique"}
    # the exact decimal sum rides the same memoized job, privately
    full = db.supplier.s_acctbal._describe_full()
    assert set(full) == {"len", "count", "min", "max", "sum", "sum_exact", "avg", "median"}


def test_groupby_join_setops(db):
    # beyond-parity ops: native groupby / join / union
    g = db.orders.groupby("o_orderstatus").count().collect()
    assert sum(r["count"] for r in g) == db.orders.len

    j = db.customer.join(db.nation, on=[db.customer.df.c_nationkey == db.nation.df.n_nationkey],
                         how="inner", broadcast_other=True)
    assert j.len == db.customer.len

    u = db.orders.union(db.orders)
    assert u.len == 2 * db.orders.len
    assert db.orders.intersect(db.orders).len == db.orders.len
    assert db.orders.except_(db.orders).len == 0


def test_table_analytics_delegates(db):
    """The beyond-parity reshape surface is reachable from Table."""
    ev = db.events
    piv = ev.pivot(["user_id"], "event_type", ["click", "view"])
    assert set(piv.columns) == {"user_id", "click", "view"}
    top = ev.top_k(["user_id"], "value", 1, tiebreak_cols=["event_id"])
    assert len(top) == db.events.df.select("user_id").distinct().count()
    wins = ev.winsorize("value", 0.1, 0.9)
    assert wins.columns == ev.columns
    ords = db.orders
    merged = ords.upsert(ords.limit(3), "o_orderkey")
    assert len(merged) == len(ords)


def test_new_analytics_delegates(db):
    from pandas_db_spark.operators import quality as Q

    e = db.events
    m = e.melt(["event_id"], ["value"])
    assert set(m.columns) == {"event_id", "variable", "value"}
    r = e.rolling("user_id", "ts", "value", 3, tiebreak_cols=["event_id"])
    assert "roll_avg" in r.columns
    li = db.lineitem
    c = li.corr(["l_quantity", "l_tax"]).data()
    assert len(c) == 1 and c[0][0] == "l_quantity"
    qc = e.check([Q.not_null("event_id")]).data()
    assert qc[0][1] == 0 and qc[0][3] is True


def test_temporal_and_hitters_delegates(db):
    e = db.events
    r = e.resample("user_id", "ts", 3600)
    assert {"grid_sec", "grid_ts"} <= set(r.columns)
    h = e.history("user_id", "ts", ["event_type"])
    assert {"valid_from", "valid_to"} <= set(h.columns)
    hh = e.heavy_hitters("event_type", k=2).data()
    assert len(hh) == 2 and hh[0][1] >= hh[1][1]


def test_shuffle_and_sessionize_delegates(db):
    """r7 facade delegates: Table.shuffle adds a 1..n pos permutation;
    Table.sessionize labels sessions on event tables."""
    d = db.documents
    sh = d.shuffle("doc_id", seed="x")
    assert "pos" in sh.columns
    n = d.shape[0]
    poss = sorted(r[-1] for r in sh[["doc_id", "pos"]].data())
    assert poss == list(range(1, n + 1))
    ev = db.events.sessionize(gap_minutes=15)
    assert "session_idx" in ev.columns
