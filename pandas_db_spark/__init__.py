"""pandas_db_spark — a PySpark-native analytics engine with the query surface of
``shner-elmo/pandas-db`` (reference: /root/reference, ``pandasdb`` v2.0.2).

The reference is a lazy, read-only, pandas-flavored façade that compiles every
call to SQL and pushes it to SQLite (reference ``README.md:17``,
``pandasdb/connection.py:17-99``).  Here the same façade is a thin wrapper over
``pyspark.sql.DataFrame``: a :class:`Table` holds a lazy DataFrame (the logical
plan *is* the reference's stacked-temp-view chain), a :class:`Column` holds a
``pyspark.sql.Column`` bound to its parent plan, and Catalyst supplies the
pushdown / pruning / fusion the reference delegated to SQLite's planner.

Beyond reference parity, the package adds what a 100 TB training-data pipeline
needs: group-by / joins / set ops (the reference's own TODO, README.md:643),
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine —
``operators/dedup.py``), similarity search over embeddings (brute-force,
sign-LSH, IVF — ``operators/similarity.py``), text analysis (tokenization,
quality, language ID, fingerprinting — ``functions/text.py``), temporal
joins (as-of / range / grid resampling / SCD2 history —
``operators/temporal.py``), skew salting and approximate sketches
(``operators/skew.py``, ``Column.nunique_approx`` / ``quantile_approx``),
declarative data-quality expectations (whole-table, per-group, streaming,
windowed trend — ``operators/quality.py``, ``streaming/quality.py``),
rolling/cumulative windows and exact-moment statistics
(``operators/rolling.py``, ``operators/stats.py``), incremental dedup
against persisted fingerprint/signature stores plus a foreachBatch ingest
pipeline (``operators/dedup.py``, ``streaming/ingest.py``), BPE tokenizer
training (``operators/bpe.py``), lexical retrieval and ANN serving indexes
(``operators/retrieval.py``, ``operators/similarity.py``),
data-skipping sinks (range-sorted, z-ordered, bucketed, Hive-partitioned —
``sources/registry.py``), multimodal column plumbing
(``operators/multimodal.py``), and streaming windows + stateful operators
over ``events`` (``streaming/``).
"""

from pandas_db_spark.session import get_spark
from pandas_db_spark.database import Database
from pandas_db_spark.table import Table
from pandas_db_spark.column import Column
from pandas_db_spark.expression import Expression
from pandas_db_spark.utils import concat
from pandas_db_spark.exceptions import (
    DatabaseError,
    FileTypeError,
    InvalidTableError,
    InvalidColumnError,
    ExpressionError,
    ViewAlreadyExists,
    ConnectionClosedWarning,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Database",
    "Table",
    "Column",
    "Expression",
    "concat",
    "DatabaseError",
    "FileTypeError",
    "InvalidTableError",
    "InvalidColumnError",
    "ExpressionError",
    "ViewAlreadyExists",
    "ConnectionClosedWarning",
]
