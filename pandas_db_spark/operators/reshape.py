"""Reshape operators: pivot (long→wide) and incremental upsert/merge.

Reference scope: pandas-db exposes neither (its TODO list stops at
group-by); both are table-stakes for an analytics engine, so they are
beyond-parity additions with exact SQL oracles.

Scale notes:

* ``pivot_agg`` REQUIRES the pivot value list.  Spark's implicit form
  first runs a distinct job over the pivot column and then builds a
  column per value — on a high-cardinality column that is a schema with
  millions of columns, i.e. a driver OOM.  Pinning the values keeps the
  plan a single keyed shuffle with one aggregate per (row key, value).
* ``upsert`` is the incremental-refresh primitive: new/changed rows
  replace rows with the same key, everything else carries over.  Shape:
  one left-anti join (broadcast when the delta is small — the common
  case: a day's delta vs years of history) + a union; the history table
  never shuffles when the delta broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def pivot_agg(df: DataFrame, key_cols: Sequence[str], pivot_col: str,
              values: Sequence, aggs: Sequence[Column] | None = None,
              ) -> DataFrame:
    """Wide table: one row per ``key_cols``, one column (per agg) per
    pivot value.  ``values`` is mandatory — see module scale note.
    Default agg: ``count(*)`` named per value."""
    if not values:
        raise ValueError("pivot_agg: pivot values must be listed "
                         "explicitly (implicit discovery scans the "
                         "column and can explode the schema)")
    aggs = list(aggs) if aggs is not None else [F.count(F.lit(1))]
    return (df.groupBy(*key_cols)
            .pivot(pivot_col, list(values))
            .agg(*aggs))


def top_k_per_group(df: DataFrame, group_cols: Sequence[str],
                    order_col: str, k: int, desc: bool = True,
                    tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Top-k rows per group by ``order_col`` — one keyed shuffle, a
    rank-limited window (Spark pushes the k-limit into the sort via
    WindowGroupLimit, so no group ever fully sorts), output gains an
    ``rk`` column (1-based).

    Pass ``tiebreak_cols`` (e.g. the primary key) to make the selection
    deterministic when ``order_col`` has ties — without it, ties at the
    k boundary are partition-order dependent."""
    if k <= 0:
        raise ValueError("top_k_per_group: k must be positive")
    from pyspark.sql import Window
    oc = F.desc(order_col) if desc else F.asc(order_col)
    order = [oc] + [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k))


def winsorize(df: DataFrame, value_col: str, p_lo: float = 0.01,
              p_hi: float = 0.99, out_col: str | None = None) -> DataFrame:
    """Clip ``value_col`` to its exact [p_lo, p_hi] quantiles — the
    outlier-capping step before statistics that are not robust to tails.

    The two boundaries come from ONE exact ``percentile`` aggregate
    (sort-based, linear interpolation — bit-identical to DuckDB's
    ``quantile_cont``, see groupby_quantiles) joined back as a broadcast
    one-row frame (scalar-subquery shape) — construction is fully LAZY,
    zero Spark jobs until the returned frame executes, and a discarded
    plan costs nothing.  The clip itself is a narrow JVM
    ``least/greatest`` pass; in-range values pass through untouched, so
    the output hashes exactly."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError("winsorize: need 0 <= p_lo < p_hi <= 1")
    bounds = (df.agg(F.percentile(value_col,
                                  F.array(F.lit(p_lo), F.lit(p_hi)))
                     .alias("__wb"))
                .select(F.col("__wb")[0].alias("__w_lo"),
                        F.col("__wb")[1].alias("__w_hi")))
    out = out_col or value_col
    clipped = F.least(F.greatest(F.col(value_col), F.col("__w_lo")),
                      F.col("__w_hi"))
    return (df.crossJoin(F.broadcast(bounds))
              .withColumn(out, clipped)
              .drop("__w_lo", "__w_hi"))


def profile_table(df: DataFrame, columns: Sequence[str] | None = None,
                  ) -> DataFrame:
    """One-pass data-quality profile: for every column, ``(column,
    n_rows, n_nulls, n_distinct)`` in long format.

    ALL metrics come from a single aggregate job — one scan however many
    columns — then a ``stack`` unpivot (pure projection).  Distinct
    counts are exact (Spark plans the multi-column count-distinct via
    expand + one shuffle); swap mentally to approx_count_distinct for
    1000-column tables if the expand factor bites.  The first thing to
    run against an unfamiliar 100 TB table before writing any query."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                    .alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}" for c in cols)
    return row.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, "
        "n_distinct)"
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def standardize(df: DataFrame, value_col: str,
                out_col: str | None = None) -> DataFrame:
    """Z-score standardization with ORDER-INDEPENDENT moments: the mean
    and variance come from exact DECIMAL sums (Σx as decimal(18,2)·100
    cents, Σx² as decimal(38,4)), so they don't depend on float
    accumulation order — a 100 TB shuffle reorders everything, and
    naive double sums would give a different mean every run.  The final
    ``(x − μ)/σ`` is a fixed single-IEEE-op sequence over those exact
    inputs, hence bit-stable across runs AND engines.

    Population variance (÷n); constant columns (σ = 0) yield null z.

    Construction is fully LAZY (scalar-subquery shape: the one-row
    moment aggregate broadcast-crossJoins the data) — zero Spark jobs
    until the returned frame executes.  ``value_col`` with rows but no
    non-null values raises at EXECUTION time (``raise_error``), since
    laziness means there is nothing to check at call time; a literally
    empty input short-circuits to empty output (PropagateEmptyRelation
    elides the whole plan, error branch included)."""
    out = out_col or f"{value_col}_z"
    v = F.col(value_col)
    moments = df.agg(
        F.count(v).alias("__z_n"),
        F.sum(v.cast("decimal(18,2)")).alias("__z_s"),
        F.sum((v.cast("decimal(18,2)") * v.cast("decimal(18,2)"))
              .cast("decimal(38,4)")).alias("__z_sq"))
    # The op sequence mirrors the former driver-side math exactly:
    # double(s)/double(n), double(sq)/n − mean², sqrt (IEEE correctly
    # rounded — matching math.sqrt / the SQL engines' sqrt; pow(x, .5)
    # would not be), so results are bit-identical to the eager version.
    nn = F.col("__z_n").cast("double")
    mean = F.when(
        F.col("__z_n") == 0,
        F.raise_error(F.lit(
            f"standardize: no non-null values in {value_col!r}"))
    ).otherwise(F.col("__z_s").cast("double") / nn)
    params = moments.select(
        mean.alias("__z_mean"),
        (F.col("__z_sq").cast("double") / nn).alias("__z_sqn"))
    var = F.col("__z_sqn") - F.col("__z_mean") * F.col("__z_mean")
    std = F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0))
    params = (params.withColumn("__z_std", std)
                    .select("__z_mean", "__z_std"))
    z = F.when(F.col("__z_std") != 0.0,
               (v - F.col("__z_mean")) / F.col("__z_std"))
    return (df.crossJoin(F.broadcast(params))
              .withColumn(out, z)
              .drop("__z_mean", "__z_std"))


def quantile_buckets(df: DataFrame, value_col: str, n_buckets: int = 10,
                     out_col: str = "bucket") -> DataFrame:
    """Assign each row its quantile bucket (1..n_buckets) WITHOUT a
    global sort: the n−1 exact interior quantile boundaries come from
    one ``percentile`` aggregate (two scalars' worth of driver traffic),
    then bucket = 1 + #boundaries strictly below the value — a narrow
    JVM pass.

    This is the scale-safe replacement for ``ntile(n) OVER (ORDER BY
    …)``, whose empty-partition window funnels the ENTIRE table through
    one task.  Semantics differ from ntile only in tie handling: equal
    values always land in the same bucket here (ntile splits ties to
    even out counts), which is usually what quality-tiered sampling
    wants anyway.

    Construction is fully LAZY — the boundary aggregate rides the plan
    as a broadcast one-row frame (scalar-subquery shape), zero Spark
    jobs until execution."""
    if n_buckets < 2:
        raise ValueError("quantile_buckets: n_buckets must be >= 2")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile(value_col, F.array(*[F.lit(p) for p in probs]))
         .alias("__qb_bounds"))
    below = F.size(F.filter("__qb_bounds",
                            lambda b: F.col(value_col) > b))
    return (df.crossJoin(F.broadcast(bounds))
              .withColumn(out_col, (F.lit(1) + below).cast("int"))
              .drop("__qb_bounds"))


def fixed_width_hist(df: DataFrame, value_col: str,
                     width_cents: int = 500) -> DataFrame:
    """Exact fixed-width histogram of a money-like double column:
    ``(bucket, lo_cents, n)`` where ``bucket = cents div width_cents``
    and ``cents = CAST(value AS DECIMAL(18,2)) · 100`` — the same
    integer-cents device as the stateful streaming totals, so bucket
    assignment is bit-identical across engines (no float boundary
    ambiguity, unlike ``width_bucket`` on raw doubles).  One keyed
    shuffle with map-side combine; the profiling primitive for value
    distributions."""
    if width_cents <= 0:
        raise ValueError("fixed_width_hist: width_cents must be positive")
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    return (df.select(cents.alias("__c"))
            .select(F.expr(f"__c div {width_cents}").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bucket",
                    (F.col("bucket") * width_cents).alias("lo_cents"),
                    "n"))


def upsert(target: DataFrame, updates: DataFrame,
           key_cols: Sequence[str] | str,
           broadcast_updates: bool = True) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``target``; all other
    target rows survive.  Column sets must match (checked).  With
    ``broadcast_updates`` (default — deltas are small) the anti-join is
    a map-side hash probe and the history never shuffles."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            "upsert: column sets differ — target has "
            f"{sorted(set(target.columns) - set(updates.columns))} extra, "
            f"updates has {sorted(set(updates.columns) - set(target.columns))}")
    probe = updates.select(*keys)
    if broadcast_updates:
        probe = F.broadcast(probe)
    kept = target.join(probe, keys, "left_anti")
    return kept.unionByName(updates)


def melt(df: DataFrame, id_cols: Sequence[str], value_cols: Sequence[str],
         var_name: str = "variable", value_name: str = "value",
         value_type: str = "double") -> DataFrame:
    """Wide→long unpivot (the inverse of ``pivot_agg``): one output row
    per (input row, value column), with the column name in ``var_name``
    and its value in ``value_name``.

    Spark's native ``unpivot`` requires the value columns to share a
    type — mixed numeric inputs are cast to ``value_type`` up front
    (explicit, so a lossy cast is the caller's visible decision, not an
    analyzer surprise).

    100 TB note: unpivot is a narrow Expand projection — zero shuffle,
    output rows = input rows × len(value_cols), emitted streamingly
    within the scan stage.  Never materializes the wide and long forms
    together."""
    if not value_cols:
        raise ValueError("melt: need at least one value column")
    missing = [c for c in [*id_cols, *value_cols] if c not in df.columns]
    if missing:
        raise ValueError(f"melt: unknown columns {missing}")
    if value_type != "string":
        # A numeric value_type would silently NULL a string column via
        # the cast — make the lossy mix a plan-time error instead.
        from pyspark.sql.types import NumericType
        bad = [c for c in value_cols
               if not isinstance(df.schema[c].dataType, NumericType)]
        if bad:
            raise TypeError(
                f"melt: columns {bad} are non-numeric but value_type="
                f"{value_type!r} — pass value_type='string' to unpivot "
                "mixed/text columns losslessly")
    cast = df.select(
        *id_cols,
        *[F.col(c).cast(value_type).alias(c) for c in value_cols])
    return cast.unpivot(list(id_cols), list(value_cols),
                        var_name, value_name)


def heavy_hitters(df: DataFrame, col: str, k: int = 20,
                  min_count: int = 1) -> DataFrame:
    """Exact top-``k`` most frequent values of ``col`` with deterministic
    tie-breaking (count DESC, value ASC) — the hot-key / vocabulary-head
    report.

    100 TB shape: map-side partial counts collapse each partition to its
    distinct values BEFORE the shuffle (one Exchange of (value, partial)
    pairs), and the final top-k is a ``TakeOrderedAndProject`` — never a
    global sort.  Driver receives exactly k rows.  The classic failure
    mode this avoids: ``orderBy(count).limit(k)`` without the combine
    shuffles every raw row.  For columns whose DISTINCT count itself
    explodes (near-unique ids), no exact method beats a sketch — see
    ``column.nunique_approx`` for the diagnosis tool."""
    if k <= 0:
        raise ValueError("heavy_hitters: k must be positive")
    counts = (df.where(F.col(col).isNotNull())
                .groupBy(col).agg(F.count(F.lit(1)).alias("count"))
                .where(F.col("count") >= min_count))
    return (counts.orderBy(F.desc("count"), F.asc(col)).limit(k))
