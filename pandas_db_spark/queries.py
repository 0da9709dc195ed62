"""Driver-contract query registry.

One entry per implemented operator from SURVEY.md §2 plus the beyond-parity
LLM-pipeline operators.  Each query is a ``(spark, sf_dir) -> DataFrame``
callable exercising the ``pandas_db_spark`` façade, paired with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables — the
driver's correctness gate (row-count + schema + order-insensitive value
hash).  Column names are aliased identically on both sides.

Floating-point discipline: any aggregate whose value depends on accumulation
order (SUM/AVG of doubles) is computed through an exact path — cast to
DECIMAL(18,2) before summing (exact, associative) and divide the exact sum
for means — so Spark and DuckDB agree bit-for-bit.  Single-operation float
math (x*y, 1-x) is IEEE-deterministic and compared raw.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_db_spark.database import Database

# name -> (callable, oracle_sql_or_None)
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}

_DB_CACHE: dict[tuple[int, str], Database] = {}


def get_db(spark: SparkSession, sf_dir: str) -> Database:
    key = (id(spark), sf_dir)
    if key not in _DB_CACHE:
        _DB_CACHE[key] = Database(sf_dir, spark=spark)
    return _DB_CACHE[key]


def q(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}


# =====================================================================
# §2.1 scans / sources
# =====================================================================

@q("scan_region", "SELECT r_regionkey, r_name FROM region")
def scan_region(spark, sf_dir):
    """Full-table scan through the Database→Table façade (SURVEY §2.1)."""
    return get_db(spark, sf_dir)["region"].df


@q("column_slice",
   "SELECT c_custkey, c_acctbal FROM customer")
def column_slice(spark, sf_dir):
    """t[[c1, c2]] column slice — ReadSchema pruned to 2 columns (§2.3)."""
    db = get_db(spark, sf_dir)
    return db.customer[["c_custkey", "c_acctbal"]].df


# =====================================================================
# §2.3 filters / predicates
# =====================================================================

@q("filter_gt",
   "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 50000")
def filter_gt(spark, sf_dir):
    o = get_db(spark, sf_dir).orders
    return o[o.o_totalprice > 50000][["o_orderkey", "o_totalprice"]].df


@q("filter_and",
   "SELECT o_orderkey FROM orders "
   "WHERE o_totalprice >= 1000 AND o_orderstatus = 'F'")
def filter_and(spark, sf_dir):
    o = get_db(spark, sf_dir).orders
    return o[(o.o_totalprice >= 1000) & (o.o_orderstatus == "F")][["o_orderkey"]].df


@q("filter_or_not",
   "SELECT o_orderkey FROM orders "
   "WHERE o_orderpriority = '1-URGENT' OR NOT (o_orderstatus = 'O')")
def filter_or_not(spark, sf_dir):
    o = get_db(spark, sf_dir).orders
    expr = (o.o_orderpriority == "1-URGENT") | (~(o.o_orderstatus == "O"))
    return o[expr][["o_orderkey"]].df


@q("filter_isin",
   "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey IN (0, 2)")
def filter_isin(spark, sf_dir):
    n = get_db(spark, sf_dir).nation
    return n[n.n_regionkey.isin([0, 2])][["n_nationkey", "n_name"]].df


@q("filter_between",
   "SELECT p_partkey, p_size FROM part WHERE p_size BETWEEN 10 AND 20")
def filter_between(spark, sf_dir):
    p = get_db(spark, sf_dir).part
    return p[p.p_size.between(10, 20)][["p_partkey", "p_size"]].df


@q("filter_like",
   "SELECT p_partkey, p_name FROM part WHERE p_name ILIKE '%red%'")
def filter_like(spark, sf_dir):
    """LIKE is case-insensitive for SQLite parity (ref tests/test_column.py:685)."""
    p = get_db(spark, sf_dir).part
    return p[p.p_name.like("%red%")][["p_partkey", "p_name"]].df


@q("filter_eq_null",
   "WITH t AS (SELECT o_orderkey, nullif(o_orderstatus, 'F') AS st FROM orders) "
   "SELECT o_orderkey FROM t WHERE st IS NULL")
def filter_eq_null(spark, sf_dir):
    """== None → IS NULL (ref column.py:709-727). Testdata has no NULLs, so
    inject them with nullif on both sides."""
    from pandas_db_spark.table import Table
    db = get_db(spark, sf_dir)
    t = Table(db.sql(
        "SELECT o_orderkey, nullif(o_orderstatus, 'F') AS st FROM orders"
    ), "t_null", db.cache)
    return t[t.st == None][["o_orderkey"]].df  # noqa: E711


@q("not_null",
   "WITH t AS (SELECT o_orderkey, nullif(o_orderstatus, 'F') AS st FROM orders) "
   "SELECT st FROM t WHERE st IS NOT NULL")
def not_null(spark, sf_dir):
    from pandas_db_spark.table import Table
    db = get_db(spark, sf_dir)
    t = Table(db.sql(
        "SELECT o_orderkey, nullif(o_orderstatus, 'F') AS st FROM orders"
    ), "t_null", db.cache)
    return t.st.not_null().dataframe


@q("filter_contains",
   "SELECT (EXISTS (SELECT 1 FROM region WHERE r_name = 'ASIA')) AS present")
def filter_contains(spark, sf_dir):
    """`value in column` probe (ref column.py:589-595)."""
    r = get_db(spark, sf_dir).region
    present = "ASIA" in r.r_name
    return spark.createDataFrame([(present,)], "present boolean")


# =====================================================================
# §2.5 aggregates
# =====================================================================

@q("agg_minmax_num",
   "SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem")
def agg_minmax_num(spark, sf_dir):
    c = get_db(spark, sf_dir).lineitem.l_extendedprice
    return spark.createDataFrame([(c.min(), c.max())], "mn double, mx double")


@q("agg_minmax_str",
   "SELECT min(c_name) AS mn, max(c_name) AS mx FROM customer")
def agg_minmax_str(spark, sf_dir):
    """min/max on text — lexicographic, like SQLite (ref column.py:174-184)."""
    c = get_db(spark, sf_dir).customer.c_name
    return spark.createDataFrame([(c.min(), c.max())], "mn string, mx string")


@q("agg_sum_avg",
   "SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
   "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty "
   "FROM lineitem")
def agg_sum_avg(spark, sf_dir):
    """sum/avg with the exact decimal accumulation path (order-independent)."""
    li = get_db(spark, sf_dir).lineitem
    row = li.df.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s"),
        F.count("l_quantity").alias("c"),
    ).collect()[0]
    return spark.createDataFrame(
        [(row["s"], row["s"] / row["c"])], "sum_qty double, avg_qty double"
    )


@q("agg_median",
   "SELECT (SELECT median(l_extendedprice) FROM lineitem) AS med_price, "
   "(SELECT median(o_totalprice) FROM orders) AS med_total")
def agg_median(spark, sf_dir):
    """Exact median (ref column.py:210-231; F.median is exact in Spark ≥3.4)."""
    db = get_db(spark, sf_dir)
    m1 = db.lineitem.l_extendedprice.median()
    m2 = db.orders.o_totalprice.median()
    return spark.createDataFrame([(m1, m2)], "med_price double, med_total double")


@q("agg_counts",
   "WITH t AS (SELECT nullif(l_linenumber, 1) AS ln FROM lineitem) "
   "SELECT count(*) AS n_len, count(ln) AS n_count, "
   "count(*) - count(ln) AS n_nulls FROM t")
def agg_counts(spark, sf_dir):
    """len == count() + null_count() (ref column.py:155-172)."""
    from pandas_db_spark.table import Table
    db = get_db(spark, sf_dir)
    t = Table(db.sql("SELECT nullif(l_linenumber, 1) AS ln FROM lineitem"),
              "t_ln", db.cache)
    c = t.ln
    return spark.createDataFrame(
        [(c.len, c.count(), c.null_count())],
        "n_len long, n_count long, n_nulls long")


@q("agg_mode",
   "WITH c AS (SELECT c_mktsegment AS value, count(*) AS cnt "
   "FROM customer GROUP BY 1) "
   "SELECT value, cnt FROM c WHERE cnt = (SELECT max(cnt) FROM c)")
def agg_mode(spark, sf_dir):
    """mode(): all values tied at max count (ref column.py:233-249)."""
    m = get_db(spark, sf_dir).customer.c_mktsegment.mode()
    return spark.createDataFrame(
        [(k, v) for k, v in m.items()], "value string, cnt long")


@q("agg_unique",
   "SELECT DISTINCT o_orderpriority AS value FROM orders")
def agg_unique(spark, sf_dir):
    u = get_db(spark, sf_dir).orders.o_orderpriority.unique()
    return spark.createDataFrame([(v,) for v in u], "value string")


@q("value_counts",
   "SELECT l_returnflag AS value, count(*) AS cnt FROM lineitem "
   "WHERE l_returnflag IS NOT NULL GROUP BY 1")
def value_counts(spark, sf_dir):
    vc = get_db(spark, sf_dir).lineitem.l_returnflag.value_counts()
    return spark.createDataFrame(
        [(k, v) for k, v in vc.items()], "value string, cnt long")


@q("describe_numeric",
   "SELECT count(*) AS n_len, count(o_totalprice) AS n_count, "
   "min(o_totalprice) AS mn, max(o_totalprice) AS mx, "
   "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sm, "
   "median(o_totalprice) AS med FROM orders")
def describe_numeric(spark, sf_dir):
    """describe() on a numeric column — one Spark job (ref column.py:251-279).
    The float sum/avg from describe are order-dependent, so the oracle-checked
    projection recomputes sum through the exact decimal path and drops avg
    (avg == sum/count is checked in agg_sum_avg)."""
    db = get_db(spark, sf_dir)
    d = db.orders.o_totalprice.describe()
    exact_sum = db.orders.df.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    ).collect()[0][0]
    return spark.createDataFrame(
        [(d["len"], d["count"], d["min"], d["max"], exact_sum, d["median"])],
        "n_len long, n_count long, mn double, mx double, sm double, med double")


@q("describe_text",
   "SELECT count(*) AS n_len, count(p_type) AS n_count, min(p_type) AS mn, "
   "max(p_type) AS mx, count(DISTINCT p_type) AS n_unique FROM part")
def describe_text(spark, sf_dir):
    d = get_db(spark, sf_dir).part.p_type.describe()
    return spark.createDataFrame(
        [(d["len"], d["count"], d["min"], d["max"], d["unique"])],
        "n_len long, n_count long, mn string, mx string, n_unique long")


# =====================================================================
# §2.7 sort / limit / iloc
# =====================================================================

@q("sort_limit",
   "SELECT o_orderkey, o_totalprice FROM orders "
   "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20")
def sort_limit(spark, sf_dir):
    """dict-form sort_values + limit (ref table.py:286-329). Tie-broken on the
    unique key so the top-20 set is deterministic."""
    o = get_db(spark, sf_dir).orders
    t = o.sort_values({"o_totalprice": "DESC", "o_orderkey": "ASC"}).limit(20)
    return t[["o_orderkey", "o_totalprice"]].df


@q("column_sort_limit",
   "SELECT o_orderkey AS v FROM orders ORDER BY o_orderkey ASC LIMIT 50")
def column_sort_limit(spark, sf_dir):
    c = get_db(spark, sf_dir).orders.o_orderkey
    return c.sort_values(ascending=True).limit(50).dataframe.toDF("v")


@q("iloc_int",
   "(SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 5) "
   "UNION ALL "
   "(SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey "
   "LIMIT 1 OFFSET (SELECT count(*) - 3 FROM orders))")
def iloc_int(spark, sf_dir):
    """iloc[int] incl. negative indexing (ref table.py:58-81)."""
    o = get_db(spark, sf_dir).orders.sort_values("o_orderkey")
    t = o[["o_orderkey", "o_totalprice"]]
    rows = [t.iloc[5], t.iloc[-3]]
    return spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")


@q("iloc_slice",
   "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey "
   "LIMIT 10 OFFSET 10")
def iloc_slice(spark, sf_dir):
    o = get_db(spark, sf_dir).orders.sort_values("o_orderkey")
    rows = o[["o_orderkey", "o_orderstatus"]].iloc[10:20]
    return spark.createDataFrame(rows, "o_orderkey long, o_orderstatus string")


@q("iloc_list",
   "(SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 0) "
   "UNION ALL (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 7) "
   "UNION ALL (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 3) "
   "UNION ALL (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 7)")
def iloc_list(spark, sf_dir):
    """iloc[list] — repeatable indices, requested order kept (ref table.py:91-104)."""
    c = get_db(spark, sf_dir).orders.sort_values("o_orderkey").o_orderkey
    cells = c.iloc[[0, 7, 3, 7]]
    return spark.createDataFrame([(v,) for v in cells], "o_orderkey long")


@q("table_len_shape",
   "SELECT count(*) AS n_rows, 11 AS n_cols FROM lineitem")
def table_len_shape(spark, sf_dir):
    t = get_db(spark, sf_dir).lineitem
    rows, cols = t.shape
    return spark.createDataFrame([(rows, cols)], "n_rows long, n_cols int")


# =====================================================================
# §2.4 joins (raw SQL parity path + native beyond-parity)
# =====================================================================

@q("join_sql",
   "SELECT c.c_name, n.n_name, r.r_name FROM customer c "
   "JOIN nation n ON c.c_nationkey = n.n_nationkey "
   "JOIN region r ON n.n_regionkey = r.r_regionkey "
   "WHERE r.r_name = 'ASIA'")
def join_sql(spark, sf_dir):
    """3-table equi join via the raw-SQL passthrough (ref connection.py:168-189,
    README.md:602-628)."""
    db = get_db(spark, sf_dir)
    return db.sql(
        "SELECT c.c_name, n.n_name, r.r_name FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA'")


@q("join_native",
   "SELECT n.n_name, count(*) AS n_customers FROM customer c "
   "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name")
def join_native(spark, sf_dir):
    """Native broadcast join + group-by (beyond parity; the dim side is
    explicitly broadcast — the 100 TB plan has no shuffle on the fact side
    beyond the agg)."""
    db = get_db(spark, sf_dir)
    c, n = db.customer, db.nation
    joined = c.join(n, on=c.df.c_nationkey == n.df.n_nationkey,
                    how="inner", broadcast_other=True)
    return (joined.df.groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_customers")))


@q("groupby_q1",
   "SELECT l_returnflag, l_linestatus, "
   "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
   "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, "
   "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty, "
   "count(*) AS count_order "
   "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
   "GROUP BY l_returnflag, l_linestatus")
def groupby_q1(spark, sf_dir):
    """TPC-H Q1-flavored pricing summary — the flagship groupBy aggregate
    (the reference's own TODO, README.md:643).  Exact decimal accumulation;
    partial (map-side) aggregation before the single hash shuffle."""
    li = get_db(spark, sf_dir).lineitem
    flt = li[li.l_shipdate <= "1998-09-02 00:00:00"]
    return (flt.df.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
         / F.count("l_quantity")).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    ))


@q("groupby_having",
   "SELECT c_nationkey, count(*) AS n FROM customer "
   "GROUP BY c_nationkey HAVING count(*) > 50")
def groupby_having(spark, sf_dir):
    c = get_db(spark, sf_dir).customer
    g = c.groupby("c_nationkey").agg(F.count(F.lit(1)).alias("n"))
    return g.filter(F.col("n") > 50)


@q("window_rank",
   "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
   "SELECT o_custkey, o_orderkey, o_totalprice, "
   "row_number() OVER (PARTITION BY o_custkey "
   "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn = 1")
def window_rank(spark, sf_dir):
    """Top order per customer via a partitioned window (beyond parity —
    partitionBy keeps the shuffle keyed, no global sort)."""
    from pyspark.sql import Window
    o = get_db(spark, sf_dir).orders
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
    return (o.df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey", "o_totalprice"))


# =====================================================================
# §2.8 set ops (beyond parity)
# =====================================================================

@q("set_union",
   "SELECT r_regionkey, r_name FROM region UNION ALL "
   "SELECT r_regionkey, r_name FROM region")
def set_union(spark, sf_dir):
    r = get_db(spark, sf_dir).region
    return r.union(r).df


@q("set_intersect",
   "SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1) "
   "INTERSECT SELECT n_nationkey FROM nation WHERE n_regionkey IN (1, 2)")
def set_intersect(spark, sf_dir):
    n = get_db(spark, sf_dir).nation
    a = n[n.n_regionkey.isin([0, 1])][["n_nationkey"]]
    b = n[n.n_regionkey.isin([1, 2])][["n_nationkey"]]
    return a.intersect(b).df


@q("set_except",
   "SELECT n_nationkey FROM nation EXCEPT ALL "
   "SELECT n_nationkey FROM nation WHERE n_regionkey = 0")
def set_except(spark, sf_dir):
    n = get_db(spark, sf_dir).nation
    a = n[["n_nationkey"]]
    b = n[n.n_regionkey == 0][["n_nationkey"]]
    return a.except_(b).df


# =====================================================================
# §2.3 / §2.11 UDFs + arithmetic
# =====================================================================

@q("apply_udf_num",
   "SELECT l_orderkey, l_quantity * 2 + 1 AS qty2 FROM lineitem")
def apply_udf_num(spark, sf_dir):
    """Column.apply through the Arrow-batched pandas-UDF path (ref
    column.py:338-364)."""
    li = get_db(spark, sf_dir).lineitem[["l_orderkey", "l_quantity"]]
    derived = li.l_quantity.apply_column(
        lambda x: x * 2 + 1, returnType="double")
    return derived._df.select(
        "l_orderkey", derived.spark_col.alias("qty2"))


@q("apply_udf_str",
   "SELECT p_partkey, lower(p_brand) AS brand_lc FROM part")
def apply_udf_str(spark, sf_dir):
    p = get_db(spark, sf_dir).part[["p_partkey", "p_brand"]]
    derived = p.p_brand.apply_column(lambda s: s.lower())
    return derived._df.select(
        "p_partkey", derived.spark_col.alias("brand_lc"))


@q("arith_exprs",
   "SELECT l_orderkey, l_linenumber, "
   "l_extendedprice * (1 - l_discount) AS disc_price, "
   "l_quantity + 5 AS qty_plus, "
   "CAST(floor(l_orderkey / 100) AS BIGINT) AS key_div "
   "FROM lineitem")
def arith_exprs(spark, sf_dir):
    """Column arithmetic: col*col, col+scalar, col//scalar (ref
    column.py:597-675) — all single-op IEEE math, bit-exact across engines."""
    li = get_db(spark, sf_dir).lineitem
    disc_price = li.l_extendedprice * (li.l_discount * (-1) + 1)
    qty_plus = li.l_quantity + 5
    key_div = li.l_orderkey // 100
    return li.df.select(
        "l_orderkey", "l_linenumber",
        disc_price.spark_col.alias("disc_price"),
        qty_plus.spark_col.alias("qty_plus"),
        key_div.spark_col.alias("key_div"))


@q("str_concat",
   "SELECT c_custkey, c_name || '_' || c_mktsegment AS tag FROM customer")
def str_concat(spark, sf_dir):
    """String + → concat (ref column.py:597-611)."""
    c = get_db(spark, sf_dir).customer
    tag = (c.c_name + "_") + c.c_mktsegment
    return c.df.select("c_custkey", tag.spark_col.alias("tag"))


@q("applymap",
   "SELECT l_tax * 10 AS l_tax, l_discount * 10 AS l_discount FROM lineitem")
def applymap(spark, sf_dir):
    """Table.applymap over every cell, distributed (ref table.py:211-234)."""
    li = get_db(spark, sf_dir).lineitem[["l_tax", "l_discount"]]
    return li._applymap_df(lambda x: x * 10, returnType="double")
