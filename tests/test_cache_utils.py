"""Cache + utils tests (reference model: tests/test_cache.py, tests/test_utils.py)."""

import pytest

from pandas_db_spark.cache import MB, Cache
from pandas_db_spark.expression import Expression
from pandas_db_spark.utils import concat, normalize_col, rename_duplicate_cols


def test_cache_hit_and_miss():
    c = Cache()
    calls = []

    def compute():
        calls.append(1)
        return 42

    assert c.memo("k", compute) == 42
    assert c.memo("k", compute) == 42
    assert len(calls) == 1
    assert "k" in c


def test_cache_item_size_gate():
    c = Cache(max_item_size=1)  # 1 MB
    big = "x" * (2 * MB)
    c.put("big", big)
    assert "big" not in c
    c.put("small", "y")
    assert "small" in c


def test_cache_total_size_gate():
    c = Cache(max_item_size=1, max_dict_size=1)
    chunk = "x" * (600 * 1024)
    c.put("a", chunk)
    c.put("b", chunk)  # would exceed 1 MB total
    assert "a" in c and "b" not in c


def test_cache_disabled():
    c = Cache(cache=False)
    c.put("k", 1)
    assert "k" not in c
    assert c.memo("k", lambda: 7) == 7
    assert "k" not in c


def test_rename_duplicate_cols():
    # a,b,a → a,b,a_2 — reference tests/test_utils.py:152-161
    assert rename_duplicate_cols(["a", "b", "a"]) == ["a", "b", "a_2"]
    assert rename_duplicate_cols(["a", "a", "a"]) == ["a", "a_2", "a_3"]
    assert rename_duplicate_cols(["x"]) == ["x"]


def test_concat():
    out = list(concat(["a", "b"], "-", ["c", "d"], sep=""))
    assert out == ["a-c", "b-d"]
    out = list(concat(["x", "y"], ["1", "2"], sep=" "))
    assert out == ["x 1", "y 2"]


def test_normalize_col():
    assert normalize_col(" Fav Color ") == "fav_color"
    assert normalize_col("A-B") == "a_b"


def test_expression_requires_spark_column():
    with pytest.raises(TypeError):
        Expression("not a column", "t")


def test_expression_cross_table_guard(db):
    a = db.orders.o_totalprice > 0
    b = db.customer.c_acctbal > 0
    with pytest.raises(ValueError):
        a & b
    with pytest.raises(ValueError):
        a | b
    combined = a & (db.orders.o_orderkey > 10)
    assert combined.table == "orders"
    assert (~a).table == "orders"
