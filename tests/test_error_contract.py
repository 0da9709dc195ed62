"""Error-contract parity: exception types AND messages pinned to the
reference's own assertions (tests/test_table.py:213-233,286-290,399-403,
tests/test_expression.py:17-29, tests/test_connection.py:33-45,165-185)."""

import sqlite3

import pytest

from pandas_db_spark import Database, ExpressionError, FileTypeError
from pandas_db_spark.exceptions import ConnectionClosedWarning

from conftest import SF_DIR


@pytest.fixture()
def orders(db):
    return db.orders


def test_iloc_type_and_range_messages(orders):
    for bad in ({}, set(), (), 3.32, "3.32"):
        with pytest.raises(
                TypeError,
                match=r"Index must be of type: int, list, or slice\. not:"):
            orders.iloc[bad]
    n = orders.len
    for idx in (n, -(n + 1)):
        with pytest.raises(IndexError, match="Given index out of range"):
            orders.iloc[idx]


def test_getitem_type_message(orders):
    with pytest.raises(
            TypeError,
            match=r"Argument must be of type str or Expression\. not:"):
        orders[42]


def test_sort_values_type_message(orders):
    for bad in (set(), (), 3.32):
        with pytest.raises(
                TypeError,
                match="column parameter must be str, list, or dict, not:"):
            orders.sort_values(bad)


def test_expression_combination_messages(db):
    o = db.orders
    with pytest.raises(
            ExpressionError,
            match="expression must be an instance of Expression, "
                  "try using a column object instead"):
        (o.o_totalprice > 0) & "o_orderkey IN (1, 2)"
    with pytest.raises(
            ExpressionError,
            match="Cannot concatenate two expressions from different tables"):
        (o.o_totalprice > 0) & (db.customer.c_acctbal > 0)


def test_file_type_error_message(spark, tmp_path):
    bad = tmp_path / "my_db.txt"
    bad.write_text("")
    with pytest.raises(
            FileTypeError,
            match=r"File extension must be one of the following: "
                  r"\.sql, \.db, \.sqlite, \.sqlite3"):
        Database(str(bad), spark=spark)


def test_closed_database_query_raises(spark):
    d = Database(SF_DIR, spark=spark)
    d.exit()
    with pytest.raises(sqlite3.ProgrammingError,
                       match=r"Cannot operate on a closed database\."):
        d.query("SELECT 1")
    with pytest.warns(ConnectionClosedWarning):
        d.exit()


def test_database_error_hierarchy():
    """Reference exceptions.py:32-34 exposes a DatabaseError catch-all;
    every concrete engine error must be catchable through it (and
    ExpressionError stays a ValueError)."""
    import pandas_db_spark as P

    for exc in (P.FileTypeError, P.InvalidTableError, P.InvalidColumnError,
                P.ExpressionError, P.ViewAlreadyExists):
        assert issubclass(exc, P.DatabaseError), exc
        assert issubclass(exc, Exception)
    assert issubclass(P.ExpressionError, ValueError)
    # warnings are not errors: stays outside the hierarchy
    assert not issubclass(P.ConnectionClosedWarning, P.DatabaseError)

    # the catch-all works end-to-end on a real engine error
    import pytest
    from tests.conftest import SF_DIR
    from pandas_db_spark import Database
    db = Database(SF_DIR)
    with pytest.raises(P.DatabaseError):
        db["no_such_table"]
