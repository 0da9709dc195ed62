"""Error / warning contract, mirroring the reference's ``pandasdb/exceptions.py:1-34``.

The reference pins exact exception types in its tests
(``tests/test_connection.py:33-45``, ``tests/test_table.py:213-233``); we keep
the same names so code written against it ports over unchanged.
"""


class DatabaseError(Exception):
    """Base database error (reference ``pandasdb/exceptions.py:32-34``).

    Catch-all for every engine-raised error, so ``except DatabaseError``
    patterns written against the reference port over.  We go one step
    further than the reference (where the concrete types are siblings of
    the base): every concrete exception below subclasses it, which makes
    the catch-all actually catch — a strict superset of the reference
    contract since they all remain ``Exception`` subclasses."""


class FileTypeError(DatabaseError):
    """Unsupported source extension (reference ``pandasdb/exceptions.py:2-4``,
    raised at ``connection.py:59-62``)."""


class InvalidTableError(DatabaseError):
    """Unknown table name (reference ``pandasdb/exceptions.py``, raised at
    ``connection.py:150-160``)."""


class InvalidColumnError(DatabaseError):
    """Unknown column name (reference ``pandasdb/exceptions.py``)."""


class ExpressionError(DatabaseError, ValueError):
    """Invalid expression combination (reference ``pandasdb/exceptions.py``,
    raised at ``expression.py:24-35``).  Also subclasses ``ValueError`` so
    code catching the generic type keeps working."""


class ViewAlreadyExists(DatabaseError):
    """Kept for API parity (reference ``pandasdb/utils.py:102-124``).  Our
    engine has no temp-view chaining, so this is never raised internally."""


class ConnectionClosedWarning(Warning):
    """Double-close warning (reference ``pandasdb/connection.py:191-228``).
    A Warning, not an error — stays outside the DatabaseError hierarchy."""
