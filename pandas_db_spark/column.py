"""Column — a handle on one column of one table.

Reference: ``pandasdb/column.py`` (a ``SELECT {col} FROM {table}`` SQL string +
connection, ``column.py:106-123``).  Here it is a column name bound to a lazy
parent ``DataFrame``; every aggregate compiles to a one-pass ``df.agg`` and
every predicate to a native boolean ``pyspark.sql.Column``, so Catalyst sees
real expressions (pushdown + pruning for free, SURVEY.md §4).

Scale notes
-----------
* Aggregates are single-pass, map-side-combined JVM aggregations — no Python
  boundary, no collect of raw data.
* ``mode``/``value_counts``/``unique`` shuffle once on the value (the same
  GROUP BY SQLite ran, reference ``column.py:233-304``) and collect only the
  distinct-value summary.
* ``apply`` is an Arrow-batched pandas UDF, not a row-at-a-time generator
  (reference ``column.py:338-364`` streamed cells through Python one by one).
* ``iloc`` attaches a distributed ordinal lazily (see ``plans/ordinal.py``).
"""

from __future__ import annotations

import random
import string as _string
from typing import Any, Callable, Generator, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_db_spark.cache import Cache
from pandas_db_spark.expression import Expression
from pandas_db_spark.iloc import IndexLoc

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

_PY_TYPE = {
    T.StringType: str, T.BooleanType: bool,
    T.ByteType: int, T.ShortType: int, T.IntegerType: int, T.LongType: int,
    T.FloatType: float, T.DoubleType: float,
}


def _plan_key(df: DataFrame) -> int | None:
    """Stable fingerprint of the logical plan for result memoization.
    On failure return None → the caller bypasses the cache entirely
    (an id()-based fallback could collide after GC reuses the address and
    serve a stale result for a different plan)."""
    try:
        return df.semanticHash()
    except Exception:
        return None


class Column:
    """One column of one table; all transforms lazy, all actions memoized."""

    def __init__(self, df: DataFrame, name: str, table: str,
                 cache: Cache | None = None, expr=None):
        self._df = df
        self._name = name
        self._table = table
        self._cache = cache if cache is not None else Cache()
        # The column is a real expression over the parent plan (default: the
        # named column).  Derived columns (arithmetic, apply) carry their
        # expression here so further composition stays lazy and correct.
        self._col = expr if expr is not None else F.col(name)

    def _derive(self, df: DataFrame | None = None, expr=None) -> "Column":
        return Column(df if df is not None else self._df, self._name,
                      self._table, self._cache,
                      expr=expr if expr is not None else self._col)

    # -- identity ---------------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @property
    def table(self) -> str:
        return self._table

    @property
    def spark_col(self):
        return self._col

    @property
    def dataframe(self) -> DataFrame:
        """Single-column lazy DataFrame view (column pruning reaches the scan)."""
        return self._df.select(self._col.alias(self._name))

    def __hash__(self) -> int:
        # __eq__ is overloaded to build predicates (reference column.py:557-559).
        return hash((self._table, self._name))

    # -- memo -------------------------------------------------------------
    def _memo(self, op: str, compute, *args):
        pk = _plan_key(self._df)
        if pk is None:
            return compute()  # unkeyable plan → skip memoization
        key = (pk, self._name, repr(self._col), op, args)
        return self._cache.memo(key, compute)

    def _datatype(self) -> T.DataType:
        return self.dataframe.schema[0].dataType

    # -- schema / types ---------------------------------------------------
    @property
    def sql_type(self) -> str:
        """Declared type (exact from the schema — the reference had to sample
        a value because SQLite affinity lies, ``column.py:125-147``)."""
        return self._datatype().simpleString()

    @property
    def type(self) -> type:
        dt = self._datatype()
        for spark_t, py_t in _PY_TYPE.items():
            if isinstance(dt, spark_t):
                return py_t
        if isinstance(dt, T.DecimalType):
            return float
        if isinstance(dt, (T.TimestampType, T.DateType)):
            import datetime
            return datetime.datetime
        return object

    def data_is_numeric(self) -> bool:
        return isinstance(self._datatype(), _NUMERIC_TYPES)

    def _require_numeric(self, op: str) -> None:
        if not self.data_is_numeric():
            raise TypeError(f"Cannot get {op} for Column of type {self.type.__name__}")

    # -- counts -----------------------------------------------------------
    @property
    def len(self) -> int:
        return self._memo("len", lambda: self._df.count())

    def __len__(self) -> int:
        return self.len

    def count(self) -> int:
        """Non-NULL count (SQL ``COUNT(col)``, reference column.py:161-166)."""
        return self._memo(
            "count",
            lambda: self._df.agg(F.count(self._col).alias("c")).collect()[0]["c"],
        )

    def null_count(self) -> int:
        return self._memo("null_count", lambda: self.len - self.count())

    # -- aggregates (single-pass JVM agg, memoized) -------------------------
    def _scalar_agg(self, op: str, expr):
        return self._memo(
            op, lambda: self._df.agg(expr.alias("v")).collect()[0]["v"]
        )

    def min(self):
        return self._scalar_agg("min", F.min(self._col))

    def max(self):
        return self._scalar_agg("max", F.max(self._col))

    def sum(self):
        self._require_numeric("sum")
        return self._scalar_agg("sum", F.sum(self._col))

    def avg(self):
        self._require_numeric("avg")
        return self._scalar_agg("avg", F.avg(self._col))

    def median(self):
        """Exact median; even n → mean of the two middle values (reference
        column.py:210-231).  ``F.median`` is exact in Spark ≥ 3.4 and
        distributes without a global sort."""
        self._require_numeric("median")
        return self._scalar_agg("median", F.median(self._col))

    # -- approximate sketches (beyond parity: the 100 TB interactive path) --
    def nunique_approx(self, rsd: float = 0.05) -> int:
        """Approximate distinct count via HyperLogLog++ (``rsd`` = target
        relative standard deviation).  Constant memory per partition and a
        tiny sketch merge instead of the full shuffle an exact
        ``count(DISTINCT)`` needs — the only sane distinct-count at 100 TB.
        Exact counterpart: ``len(unique())``."""
        return self._scalar_agg(
            f"nunique_approx:{rsd}", F.approx_count_distinct(self._col, rsd))

    def quantile_approx(self, q: float | list[float],
                        accuracy: int = 10_000):
        """Approximate quantile(s) via the Greenwald-Khanna sketch
        (``percentile_approx``): one pass, mergeable per-partition state,
        error ≤ 1/accuracy of rank.  Exact counterpart for 0.5:
        :meth:`median`."""
        self._require_numeric("quantile_approx")
        qs = q if isinstance(q, list) else [q]
        expr = F.percentile_approx(
            self._col, qs if isinstance(q, list) else qs[0],
            F.lit(accuracy))
        return self._scalar_agg(f"quantile_approx:{q}:{accuracy}", expr)

    def mode(self, max_ties: int | None = 100_000) -> dict:
        """All values tied at the max count, NULL included if modal
        (reference column.py:233-249 — its GROUP BY has no NULL filter).

        Scale note: the aggregation is distributed (one keyed shuffle),
        but the *tied* rows are collected to the driver — the dict return
        is the reference's API contract.  Real data has few ties, so this
        is fine at any corpus size UNLESS the column is near-unique
        (every value count 1 → the whole column is "tied").  That caveat
        is ENFORCED (r13, the graph hub-cap pattern): more than
        ``max_ties`` tied values raises instead of silently collecting
        the column; use :meth:`value_counts` (bounded by distinct count),
        :meth:`nunique_approx` first, or raise the valve deliberately.
        ``max_ties=None`` disables the valve entirely — exact reference
        behavior (EVERY tied value returned, however many), documented as
        the deviation's escape hatch in README's migration notes
        (ADVICE r13)."""
        def compute():
            counts = self._df.groupBy(self._col.alias(self._name)).agg(
                F.count(F.lit(1)).alias("cnt"))
            # tiny jobs share one shuffle: persist the grouped counts so
            # the max-probe, tie count, and tie collect don't re-aggregate
            counts = counts.persist()
            try:
                top = counts.agg(F.max("cnt").alias("m")).collect()[0]["m"]
                ties = counts.filter(F.col("cnt") == top)
                n_ties = ties.count()
                if max_ties is not None and n_ties > max_ties:
                    raise ValueError(
                        f"mode(): {n_ties} values tied at max count "
                        f"{top} exceeds max_ties={max_ties} — the column "
                        "is near-unique and collecting every tie would "
                        "ship it to the driver; use value_counts()/"
                        "nunique_approx(), or pass a larger max_ties "
                        "deliberately")
                rows = ties.collect()
            finally:
                counts.unpersist()
            return {row[self._name]: row["cnt"] for row in rows}
        return self._memo(f"mode:{max_ties}", compute)

    def unique(self) -> list:
        """Distinct values, NULL included.  Order is engine-determined (the
        reference inherited SQLite's first-seen order, column.py:281-287; we
        promise set-equality — SURVEY.md §7.4).

        Scale note: the distinct runs distributed, but the resulting value
        set is collected to the driver — the list return is the
        reference's API contract, sized by the column's CARDINALITY, not
        the table.  Fine for categorical/dimension columns at any scale;
        for near-unique columns (ids, text) the list is the data —
        use :meth:`nunique_approx` for the count, or ``value_counts``
        on a filtered/limited frame, or keep it distributed with
        ``table.df.select(col).distinct()``."""
        def compute():
            return [r[self._name] for r in self.dataframe.distinct().collect()]
        return self._memo("unique", compute)

    def value_counts(self) -> dict:
        """{value: count}, NULL excluded, ordered count DESC then value ASC
        (reference column.py:289-304)."""
        def compute():
            rows = (
                self._df.filter(self._col.isNotNull())
                .groupBy(self._col.alias(self._name))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc(self._name))
                .collect()
            )
            return {r[self._name]: r["cnt"] for r in rows}
        return self._memo("value_counts", compute)

    def describe(self) -> dict:
        """Numeric: len/count/min/max/sum/avg/median; else len/count/min/max/
        unique-count — EXACTLY the reference's key set (column.py:251-279).
        One Spark job for the numeric block instead of seven.  The exact
        decimal-path sum is computed in the same job but kept out of this
        public dict (ADVICE r5: dict-equality consumers expect reference
        parity); see ``_describe_full``."""
        if self.data_is_numeric():
            full = self._describe_full()
            return {k: full[k] for k in
                    ("len", "count", "min", "max", "sum", "avg", "median")}
        def compute():
            row = self._df.agg(
                F.count(F.lit(1)).alias("len"),
                F.count(self._col).alias("count"),
                F.min(self._col).alias("min"),
                F.max(self._col).alias("max"),
                F.count_distinct(self._col).alias("unique"),
            ).collect()[0]
            return {k: row[k] for k in ("len", "count", "min", "max", "unique")}
        return self._memo("describe_txt", compute)

    def _describe_full(self) -> dict:
        """Numeric describe PLUS ``sum_exact``: decimal(18,2) accumulation —
        associative, so partition order can't perturb it (the float "sum"
        keeps reference parity; sum_exact feeds oracle-checked paths in the
        same single job instead of a second pass — round-4 verdict #5).
        Values beyond decimal(18,2) range yield NULL rather than a wrong
        number.  Private: the public describe() strips sum_exact."""
        def compute():
            row = self._df.agg(
                F.count(F.lit(1)).alias("len"),
                F.count(self._col).alias("count"),
                F.min(self._col).alias("min"),
                F.max(self._col).alias("max"),
                F.sum(self._col).alias("sum"),
                F.sum(self._col.cast("decimal(18,2)"))
                 .cast("double").alias("sum_exact"),
                F.avg(self._col).alias("avg"),
                F.median(self._col).alias("median"),
            ).collect()[0]
            return {k: row[k] for k in
                    ("len", "count", "min", "max", "sum", "sum_exact",
                     "avg", "median")}
        return self._memo("describe_num", compute)

    # -- predicates ---------------------------------------------------------
    def _expr(self, cond) -> Expression:
        return Expression(cond, self._table)

    def __gt__(self, other) -> Expression:
        return self._expr(self.spark_col > other)

    def __ge__(self, other) -> Expression:
        return self._expr(self.spark_col >= other)

    def __lt__(self, other) -> Expression:
        return self._expr(self.spark_col < other)

    def __le__(self, other) -> Expression:
        return self._expr(self.spark_col <= other)

    def __eq__(self, other) -> Expression:  # type: ignore[override]
        # == None → IS NULL (reference column.py:709-727); SQL 3VL otherwise.
        if other is None:
            return self._expr(self.spark_col.isNull())
        return self._expr(self.spark_col == other)

    def __ne__(self, other) -> Expression:  # type: ignore[override]
        if other is None:
            return self._expr(self.spark_col.isNotNull())
        return self._expr(self.spark_col != other)

    def isin(self, options: Iterable) -> Expression:
        return self._expr(self.spark_col.isin(list(options)))

    def between(self, x, y) -> Expression:
        return self._expr(self.spark_col.between(x, y))

    def like(self, pattern: str) -> Expression:
        """SQL LIKE — case-INSENSITIVE for parity with SQLite (reference
        tests/test_column.py:685-695); Spark's ``like`` is case-sensitive so
        this lowers to ``ilike``."""
        return self._expr(self.spark_col.ilike(pattern))

    def not_null(self) -> "Column":
        return self._derive(df=self._df.filter(self._col.isNotNull()))

    def __contains__(self, item) -> bool:
        # `value in column` — reference column.py:589-595 (LIMIT 1 probe).
        return (
            self._df.filter(self.spark_col == F.lit(item)).limit(1).count() > 0
        )

    # -- transforms (lazy; each returns a new Column view) -------------------
    def filter(self, expression: Expression) -> "Column":
        if not isinstance(expression, Expression):
            raise TypeError(f"expression must be an Expression, got {type(expression)}")
        if expression.table != self._table:
            raise ValueError(
                f"Cannot filter column of table {self._table!r} with an "
                f"expression from table {expression.table!r}"
            )
        return self._derive(df=self._df.filter(expression.condition))

    def __getitem__(self, item):
        if isinstance(item, Expression):
            return self.filter(item)
        return self.iloc[item]

    def sort_values(self, ascending: bool = True) -> "Column":
        # NULLs first when ascending, matching SQLite and Spark defaults
        # (reference tests/test_column.py:362-367).
        order = self._col.asc() if ascending else self._col.desc()
        return self._derive(df=self._df.orderBy(order))

    def limit(self, n: int) -> "Column":
        return self._derive(df=self._df.limit(n))

    def sample(self, n: int = 10) -> "Column":
        """Exact-n uniform sample (reference ``ORDER BY RANDOM() LIMIT n``,
        column.py:328-336).  Distributed: per-row random key + total-order
        top-n (Spark's TakeOrderedAndProject — no full sort materialized)."""
        seed = random.randint(0, 2**31 - 1)
        return self._derive(df=self._df.orderBy(F.rand(seed)).limit(n))

    def apply(self, func: Callable, *, ignore_na: bool = True,
              returnType=None, args: tuple = (), **kwargs: Any) -> Generator:
        """Apply a Python function per cell, NULLs passed through when
        ``ignore_na`` (reference column.py:338-364 returns a generator; we
        compute distributed via an Arrow-batched pandas UDF, then stream)."""
        transformed = self.apply_column(func, ignore_na=ignore_na,
                                        returnType=returnType, args=args, **kwargs)
        for row in transformed.dataframe.toLocalIterator():
            yield row[0]

    def apply_column(self, func: Callable, *, ignore_na: bool = True,
                     returnType=None, args: tuple = (), **kwargs: Any) -> "Column":
        """Lazy, distributed variant of :meth:`apply` — returns a new Column
        (our engine keeps the result inside the engine; divergence documented
        in SURVEY.md §2.11).

        ``returnType`` (Spark type or DDL string, e.g. ``"double"``) declares
        the UDF's output type.  When omitted, the function is assumed
        type-preserving and the column's own type is used — no data is read
        and no job runs at plan-build time; pass ``returnType`` explicitly for
        type-changing functions.
        """
        def batch_fn(s: pd.Series) -> pd.Series:
            if not ignore_na:
                return s.map(lambda x: func(x, *args, **kwargs))

            def cell(x):
                # NULLs arrive as None (object dtype) or NaN/NaT (numeric /
                # datetime dtypes after Arrow transfer) — treat all as NULL
                # and pass through, like the reference's ignore_na.
                if x is None:
                    return None
                try:
                    if pd.isna(x):
                        return None
                except (TypeError, ValueError):
                    pass  # array-valued cell — pd.isna is elementwise
                return func(x, *args, **kwargs)
            return s.map(cell)

        spark_t = returnType if returnType is not None else self._datatype()
        udf = F.pandas_udf(batch_fn, returnType=spark_t)  # type: ignore[call-overload]
        new_df = self._df.withColumn(self._name, udf(self._col))
        return Column(new_df, self._name, self._table, self._cache)

    # -- arithmetic -----------------------------------------------------------
    # Scalar / Column operands stay distributed (native Column arithmetic);
    # plain-iterable operands require a driver-side strict zip exactly like
    # the reference (column.py:597-675) — that form inherently leaves the
    # engine, so it returns a generator for parity.
    def _arith(self, other, op: str):
        if isinstance(other, Column):
            if other._table != self._table:
                raise ValueError("Cannot combine columns from different tables")
            return self._arith_col(other.spark_col, op)
        if isinstance(other, str) or not isinstance(other, Iterable):
            return self._arith_col(F.lit(other), op)
        return self._arith_iterable(other, op)

    def _arith_col(self, other_col, op: str) -> "Column":
        c = self._col
        is_str = isinstance(self._datatype(), T.StringType)
        if op == "+":
            expr = F.concat(c, other_col) if is_str else c + other_col
        elif op == "-":
            expr = c - other_col
        elif op == "*":
            expr = c * other_col
        elif op == "/":
            expr = c / other_col
        elif op == "//":
            expr = F.floor(c / other_col).cast("long")
        else:  # pragma: no cover
            raise ValueError(op)
        # NULL-preserving on the left operand is native SQL semantics.
        return self._derive(expr=expr)

    def _arith_iterable(self, other: Iterable, op: str) -> Generator:
        import operator as _op
        fn = {"+": _op.add, "-": _op.sub, "*": _op.mul,
              "/": _op.truediv, "//": _op.floordiv}[op]

        def gen():
            for x, y in zip(self, other, strict=True):
                yield None if x is None else fn(x, y)
        return gen()

    def __add__(self, other):
        return self._arith(other, "+")

    def __sub__(self, other):
        return self._arith(other, "-")

    def __mul__(self, other):
        return self._arith(other, "*")

    def __truediv__(self, other):
        return self._arith(other, "/")

    def __floordiv__(self, other):
        return self._arith(other, "//")

    # -- actions ---------------------------------------------------------------
    def data(self, limit: int | None = None) -> list:
        df = self.dataframe if limit is None else self.dataframe.limit(limit)
        return [row[0] for row in df.collect()]

    def to_series(self) -> pd.Series:
        pdf = self.dataframe.toPandas()
        s = pdf[pdf.columns[0]]
        s.name = self._name
        return s

    def __iter__(self):
        for row in self.dataframe.toLocalIterator():
            yield row[0]

    @property
    def iloc(self) -> IndexLoc:
        return IndexLoc(self.dataframe, scalar=True)

    def __repr__(self) -> str:
        head = self.data(limit=10)
        return f"Column(table={self._table!r}, name={self._name!r}, head={head})"
