"""Filter predicates.

The reference's ``Expression`` is a SQL text fragment plus the source-table
name, composed with ``&``/``|`` under a same-table guard
(``pandasdb/expression.py:6-59``).  Here the payload is a native boolean
``pyspark.sql.Column`` — Catalyst gets a real predicate tree instead of a
string — and we keep only the guard (reference ``expression.py:30-35``) as
user-facing validation.

The reference's documented manual-fragment escape hatch
(``pandasdb/table.py:256-259``:
``df.filter(Expression('col BETWEEN 3.2 AND 7.8', table_name))``) is
supported too: a plain ``str`` condition is parsed once by ``F.expr`` into
the same native predicate tree — Catalyst analyzes it against the bound
table at filter time, so pushdown/pruning work exactly as for
operator-built predicates.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F

from pandas_db_spark.exceptions import ExpressionError


class Expression:
    """A boolean predicate bound to one table.

    ``condition`` is a pyspark boolean ``Column`` (the operator-composition
    path) or a raw SQL fragment ``str`` (the reference's manual escape
    hatch, ``pandasdb/expression.py:10-21``) — anything else raises
    TypeError, matching the reference's str-only gate
    (``tests/test_expression.py:8-13``)."""

    def __init__(self, condition: SparkColumn | str, table: str):
        if isinstance(condition, str):
            condition = F.expr(condition)
        elif not isinstance(condition, SparkColumn):
            raise TypeError(
                f"condition must be a pyspark Column or a SQL fragment "
                f"str, got {type(condition)}")
        self.condition = condition
        self.table = table

    def _check_table(self, other: "Expression") -> None:
        # Type + same-table guard; messages pinned to the reference's
        # (expression.py:24-35, tests/test_expression.py:17-29).
        if not isinstance(other, Expression):
            raise ExpressionError(
                "expression must be an instance of Expression, "
                "try using a column object instead"
            )
        if self.table != other.table:
            raise ExpressionError(
                "Cannot concatenate two expressions from different tables: "
                f"{self.table!r} and {other.table!r}"
            )

    def __and__(self, other: "Expression") -> "Expression":
        self._check_table(other)
        return Expression(self.condition & other.condition, self.table)

    def __or__(self, other: "Expression") -> "Expression":
        self._check_table(other)
        return Expression(self.condition | other.condition, self.table)

    def __invert__(self) -> "Expression":
        return Expression(~self.condition, self.table)

    def __repr__(self) -> str:
        return f"Expression(table={self.table!r}, condition={self.condition})"
