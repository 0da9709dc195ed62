"""Error / warning contract, mirroring the reference's ``pandasdb/exceptions.py:1-34``.

The reference pins exact exception types in its tests
(``tests/test_connection.py:33-45``, ``tests/test_table.py:213-233``); we keep
the same names so code written against it ports over unchanged.
"""


class FileTypeError(Exception):
    """Unsupported source extension (reference ``pandasdb/exceptions.py:2-4``,
    raised at ``connection.py:59-62``)."""


class InvalidTableError(Exception):
    """Unknown table name (reference ``pandasdb/exceptions.py``, raised at
    ``connection.py:150-160``)."""


class InvalidColumnError(Exception):
    """Unknown column name (reference ``pandasdb/exceptions.py``)."""


class ExpressionError(ValueError):
    """Invalid expression combination (reference ``pandasdb/exceptions.py``,
    raised at ``expression.py:24-35``).  Subclasses ``ValueError`` so code
    catching the generic type keeps working."""


class ViewAlreadyExists(Exception):
    """Kept for API parity (reference ``pandasdb/utils.py:102-124``).  Our
    engine has no temp-view chaining, so this is never raised internally."""


class ConnectionClosedWarning(Warning):
    """Double-close warning (reference ``pandasdb/connection.py:191-228``)."""
