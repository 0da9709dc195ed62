"""Exact-moment multivariate statistics (correlation / covariance matrix).

Reference scope: pandas-db stops at per-column aggregates; a correlation
matrix over feature columns is a standard profiling step before model
training, so this is a beyond-parity addition with an exact SQL oracle.

Float discipline — the whole point of this module: naive ``corr()`` is a
running-moment accumulation whose result depends on partition order, so
Spark and any oracle disagree in the low bits (and Spark disagrees with
ITSELF across partitioning changes).  Here every moment (Σx, Σx², Σxy)
is accumulated as an exact DECIMAL (associative — partition-order
independent), and the final Pearson formula

    corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ₛ) · (n·Σy² − Σy²ₛ))

is evaluated as ONE fixed sequence of IEEE double ops on the exact
sums — bit-identical across engines and across runs.

Scale shape: ONE aggregate job over ONE scan computes every pairwise
moment for k columns (k(k+1)/2 + k + 1 agg expressions, all folded into
the same whole-stage-codegen pass with map-side partial aggregation);
the pair table is then unpivoted from the single result row inside the
plan — no driver collect, no per-pair scan.  k is schema-bounded (tens,
not thousands) so the expression count is trivial.

Input contract: values must fit the declared decimal scale (default 2 —
currency-like data).  A value with more fractional digits is ROUNDED at
the cast on both engines identically; pick ``scale`` to cover the data's
true precision.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from pandas_db_spark.session import tiny_df


def _moments(cols: Sequence[str], scale: int) -> list[Column]:
    """n, per-column Σx and Σx², per-pair Σxy — all exact decimals.

    Product sums carry scale ``2*scale`` — the EXACT scale of a
    scale-``scale`` × scale-``scale`` product.

    The decimal→double conversion goes THROUGH A STRING.  A direct
    decimal cast is engine-dependent once the scaled integer exceeds
    2⁵³ (measured: DuckDB's int128→double path double-rounds an ulp
    away from Java BigDecimal.doubleValue's correctly-rounded result),
    but decimal→string is exact everywhere and string→double is the
    correctly-rounded conversion in every engine — so both sides land
    on the identical double at ANY magnitude.  Cost: one tiny string
    per aggregate output row."""
    dt = f"decimal(18,{scale})"
    pt = f"decimal(38,{2 * scale})"

    def as_double(col: Column) -> Column:
        return col.cast("string").cast("double")

    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    for c in cols:
        x = F.col(c).cast(dt)
        aggs.append(as_double(F.sum(x)).alias(f"__s_{c}"))
        aggs.append(as_double(F.sum((x * x).cast(pt)))
                    .alias(f"__ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            xy = (F.col(a).cast(dt) * F.col(b).cast(dt)).cast(pt)
            aggs.append(as_double(F.sum(xy)).alias(f"__p_{a}__{b}"))
    return aggs


def corr_matrix(df: DataFrame, cols: Sequence[str],
                scale: int = 2) -> DataFrame:
    """Long-form Pearson correlation for every column pair (a < b in
    input order): ``(col_a, col_b, corr double)``.

    Deterministic by construction (see module docstring); NULL-free
    input assumed — rows with NULL in any listed column should be
    filtered or imputed first (documented rather than silently pairwise-
    deleted, which would make each pair's n differ invisibly)."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError("corr_matrix: duplicate columns")
    one = df.agg(*_moments(cols, scale))

    n = F.col("__n")
    pairs: list[Column] = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = n * F.col(f"__p_{a}__{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
            va = n * F.col(f"__ss_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}")
            vb = n * F.col(f"__ss_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")
            pairs.extend([F.lit(a), F.lit(b),
                          num / F.sqrt(va * vb)])
    k = len(cols) * (len(cols) - 1) // 2
    return one.select(
        F.stack(F.lit(k), *pairs).alias("col_a", "col_b", "corr"))


def cov_matrix(df: DataFrame, cols: Sequence[str],
               scale: int = 2) -> DataFrame:
    """Long-form POPULATION covariance per pair (same exactness
    contract): ``cov = (n·Σxy − Σx·Σy) / n²`` evaluated in doubles on
    exact sums."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("cov_matrix: need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError("cov_matrix: duplicate columns")
    one = df.agg(*_moments(cols, scale))
    n = F.col("__n")
    pairs: list[Column] = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = n * F.col(f"__p_{a}__{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
            pairs.extend([F.lit(a), F.lit(b), num / (n * n)])
    k = len(cols) * (len(cols) - 1) // 2
    return one.select(
        F.stack(F.lit(k), *pairs).alias("col_a", "col_b", "cov"))


def corr_by(df: DataFrame, group_cols: Sequence[str],
            cols: Sequence[str], scale: int = 2) -> DataFrame:
    """Per-group pairwise Pearson correlation — e.g. quality-vs-length
    per source: ``(group_cols..., col_a, col_b, corr)``.

    Same exactness contract as :func:`corr_matrix`, keyed: all moments
    for every pair ride ONE ``groupBy`` aggregate (one keyed shuffle,
    map-side partials), the per-group unpivot happens in-plan.  Groups
    with fewer than 2 rows or a constant column yield NULL corr (0/0 →
    NULL via nullif) rather than a misleading number."""
    cols, group_cols = list(cols), list(group_cols)
    if not group_cols:
        raise ValueError("corr_by: empty group_cols — use corr_matrix")
    if len(cols) < 2:
        raise ValueError("corr_by: need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError("corr_by: duplicate columns")
    one = df.groupBy(*group_cols).agg(*_moments(cols, scale))

    n = F.col("__n")
    pairs: list[Column] = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = n * F.col(f"__p_{a}__{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
            va = n * F.col(f"__ss_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}")
            vb = n * F.col(f"__ss_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")
            pairs.extend([
                F.lit(a), F.lit(b),
                num / F.nullif(F.sqrt(va * vb), F.lit(0.0))])
    k = len(cols) * (len(cols) - 1) // 2
    return one.select(
        *group_cols,
        F.stack(F.lit(k), *pairs).alias("col_a", "col_b", "corr"))


def _guarded_totals(na: DataFrame, nb: DataFrame) -> DataFrame:
    """One-row ``(n_a, n_b)`` scalars frame with an IN-PLAN overflow
    guard (ADVICE r10): raises at execution time when ``n_a·n_b``
    would exceed ``2⁶³-1`` — non-ANSI Spark would otherwise WRAP the
    exact-integer cross products silently.  Division-based check (the
    product itself would overflow); empty sides are trivially safe."""
    maxl = (1 << 63) - 1
    guard_msg = (
        "term_drift: n_a*n_b would exceed 2^63-1 — the exact-integer "
        "cross-multiplication would wrap silently under non-ANSI longs; "
        "shard the snapshots or compute with DECIMAL(38) arithmetic")
    # NULL n_a (sum over an EMPTY snapshot A) is trivially safe — without
    # the isNull arm the comparison evaluates NULL, CASE treats it as
    # false, and the guard would raise the overflow message on an empty
    # side instead of passing the null totals through (ADVICE r11).
    safe = (F.col("n_a").isNull()
            | (F.coalesce(F.col("n_b"), F.lit(0)) == 0)
            | (F.col("n_a") <= F.expr(f"{maxl} div n_b")))
    return (na.crossJoin(nb)
              .select(F.when(safe, F.col("n_a"))
                       .otherwise(F.raise_error(F.lit(guard_msg)))
                       .alias("n_a"),
                      "n_b"))


def term_drift(a: DataFrame, b: DataFrame, text_col: str = "text"
               ) -> DataFrame:
    """Per-term distribution drift between two corpus snapshots — the
    monitoring report a rolling ingest runs when a new crawl lands
    (which terms shifted share?  did the mix move?).  Returns one row
    per term in the UNION vocabulary:

        ``(term, c_a, c_b, n_a, n_b, drift_num)``

    where ``c`` are term counts, ``n`` total token counts, and
    ``drift_num = |c_a·n_b − c_b·n_a|`` — the share difference
    ``|p_a − p_b|`` cross-multiplied to an EXACT INTEGER.  Integer
    sums are order-independent, so the report (and the TVD summary
    :func:`tvd_summary` folds from it) hashes bit-identically on any
    engine — the same libm-avoidance discipline as ``operators/lm``
    (KL/JS need per-term ``log``, whose last-ulp engine variance the
    module docstring there rules out; total-variation distance is the
    drift metric with an exact form: TVD = Σ drift_num / (2·n_a·n_b)).

    Shape: one token explode + map-side-combined count per side, a
    full-outer join of the two PRE-AGGREGATED |vocab|-row count tables
    (never the corpora), scalar totals attached as one-row broadcasts.
    Overflow: since any ``c ≤ n``, every cross product is bounded by
    ``n_a·n_b``; the one-row scalars frame carries an IN-PLAN guard
    (ADVICE r10) that raises at execution time when ``n_a·n_b ≥ 2⁶³``
    — non-ANSI Spark would otherwise WRAP int64 silently and report a
    wrong drift.  Past that scale, run the report per SHARD or switch
    to DECIMAL(38) — the report is per-snapshot-pair, not
    per-history."""
    return drift_from_counts(term_counts(a, text_col),
                             term_counts(b, text_col))


def term_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact per-term token counts ``(term, c)`` — one explode + one
    map-side-combined count.  The pre-aggregated form every drift
    consumer composes over (a |vocab|-row table, never the corpus):
    batch snapshots of this table are what the streaming monitor
    persists and folds."""
    toks = F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    return df.select(toks).groupBy("term").agg(
        F.count("*").alias("c"))


def drift_from_counts(ca: DataFrame, cb: DataFrame) -> DataFrame:
    """:func:`term_drift` over PRE-AGGREGATED count tables
    ``(term, c)`` — the entry point for consumers that already hold
    vocab counts (the streaming drift monitor's persisted per-batch
    snapshots, a warehouse vocab table).  Identical output contract
    and overflow guard; counts must be the exact per-side totals."""
    ca = ca.select("term", F.col("c").alias("c_a"))
    cb = cb.select("term", F.col("c").alias("c_b"))
    na = ca.agg(F.sum("c_a").alias("n_a"))
    nb = cb.agg(F.sum("c_b").alias("n_b"))
    scalars = _guarded_totals(na, nb)
    u = (ca.join(cb, "term", "full_outer")
           .select("term",
                   F.coalesce("c_a", F.lit(0)).alias("c_a"),
                   F.coalesce("c_b", F.lit(0)).alias("c_b"))
           .crossJoin(F.broadcast(scalars)))
    drift = F.abs(F.col("c_a") * F.col("n_b")
                  - F.col("c_b") * F.col("n_a"))
    return u.select("term", "c_a", "c_b", "n_a", "n_b",
                    drift.alias("drift_num"))


def tvd_summary(drift: DataFrame) -> DataFrame:
    """One-row exact-integer total-variation summary of a
    :func:`term_drift` report: ``(tvd_num, n_a, n_b)`` with
    ``TVD = tvd_num / (2·n_a·n_b)`` ∈ [0, 1] left to the caller (the
    division is the only inexact step, so it stays out of the hashed
    surface)."""
    return drift.agg(F.sum("drift_num").alias("tvd_num"),
                     F.first("n_a").alias("n_a"),
                     F.first("n_b").alias("n_b"))


# Histogram-bisection exact median (r14).  F.median buffers every value
# into a boxed per-partition map merged by ONE task — measured 2.6-3.1 s
# on 600k doubles at sf0.1, slower than a full range SORT of the same
# data.  The selection below answers the same question with two
# whole-stage-codegen jobs: a 4096-bin count/min/max histogram locates
# the bin holding the target rank, then only THAT bin's rows (bounded by
# _MEDIAN_COLLECT_CAP, else the range narrows and the histogram repeats)
# are collected and sorted.  Result is bit-identical to F.median: the
# rank arithmetic and the even-n interpolation (0.5*lo + 0.5*hi, the
# exact weights Percentile uses at position fraction .5) replicate
# Spark's Percentile evaluation, verified value-equal on every oracle
# column.
_MEDIAN_BINS = 4096
_MEDIAN_COLLECT_CAP = 1 << 17  # ≤ 131072 one-double rows ≈ 1 MB driver


class OrderStatsUnresolved(Exception):
    """Raised by :func:`exact_order_stats` when the histogram refinement
    cannot resolve (non-finite data inside the range, or a value range
    collapsing below double resolution while still holding more than the
    collect cap) — callers fall back to their exact sort-based path."""


def exact_order_stats(vdf: DataFrame, col: str, ranks: list,
                      lo: float, hi: float, n: int = -1) -> dict:
    """Exact values at the given 1-based sorted ``ranks`` of
    ``vdf[col]`` — the multi-target generalization of
    :func:`_exact_median`'s histogram bisection (r14, built for the
    quantile-summary store's equi-depth append: one 4096-bin codegen
    histogram splits ALL target ranks into their bins at once, tied
    bins resolve for free from the histogram min, small bins resolve
    from ONE batched bounded collect keyed by BIN INDEX — an ``isin``
    over ints, not an OR-of-ranges tree whose per-batch literals would
    recompile a huge codegen function every call — and oversized bins
    recurse on their own narrowed range).  When the caller passes the
    total row count ``n`` and it is within the collect cap, the whole
    column collects in ONE job and every rank reads off the sorted
    driver array (small micro-batches never pay the histogram).

    Contract: ``vdf[col]`` has no NULLs, all values lie in ``[lo, hi]``
    (finite), and every rank satisfies ``1 <= r <= n``.  Returns
    ``{rank: value}`` with each value EXACTLY the one a full sort would
    place at that rank (ties make the value at a rank well-defined
    regardless of tie order).  Raises :class:`OrderStatsUnresolved` on
    the degenerate shapes documented above — never returns an
    approximation."""
    if not ranks:
        return {}
    if not (math.isfinite(lo) and math.isfinite(hi)):
        raise OrderStatsUnresolved("non-finite bounds")
    out: dict = {}
    base = vdf.select(F.col(col).alias("__v"))
    if 0 <= n <= _MEDIAN_COLLECT_CAP:
        got = sorted(row["__v"] for row in base.collect())
        if len(got) != n:  # pragma: no cover — caller contract broken
            raise ValueError(f"exact_order_stats: n={n} declared but "
                             f"{len(got)} rows collected")
        return {r: float(got[r - 1]) for r in ranks}
    # (lo, hi, ranks_before_lo_range, sorted target ranks, depth)
    pending = [(float(lo), float(hi), 0, sorted(ranks), 0)]
    while pending:
        clo, chi, off, rks, depth = pending.pop()
        if clo == chi:
            for r in rks:
                out[r] = float(clo)
            continue
        if depth >= 64:  # pragma: no cover — doubles halve out in 64
            raise OrderStatsUnresolved("range failed to resolve")
        w = (chi - clo) / _MEDIAN_BINS
        if not (w > 0):
            raise OrderStatsUnresolved("range below double resolution")
        cur = base.where((F.col("__v") >= F.lit(clo))
                         & (F.col("__v") <= F.lit(chi)))
        binc = F.least(F.floor((F.col("__v") - F.lit(clo)) / F.lit(w)),
                       F.lit(_MEDIAN_BINS - 1)).cast("int")
        hist = (cur.groupBy(binc.alias("b"))
                .agg(F.count(F.lit(1)).alias("c"),
                     F.min("__v").alias("mn"), F.max("__v").alias("mx"))
                .orderBy("b").collect())
        # walk bins in value order, routing each target rank to its bin
        collect_bins = []  # (bin index, first_rank_before, taken, count)
        it = iter(rks)
        r = next(it, None)
        cum = off
        for h in hist:
            lo_r, cum = cum, cum + h["c"]
            taken = []
            while r is not None and r <= cum:
                taken.append(r)
                r = next(it, None)
            if not taken:
                continue
            if h["mn"] == h["mx"]:
                for r2 in taken:
                    out[r2] = float(h["mn"])
            elif h["c"] <= _MEDIAN_COLLECT_CAP:
                collect_bins.append((int(h["b"]), lo_r, taken,
                                     int(h["c"])))
            else:
                pending.append((float(h["mn"]), float(h["mx"]), lo_r,
                                taken, depth + 1))
        if r is not None:
            raise ValueError(f"exact_order_stats: rank {r} beyond the "
                             "data in [lo, hi] — caller contract broken")
        # resolve all small bins of this level in ONE batched job keyed
        # by bin index (bins are value-disjoint and ascending, so each
        # bin's rows appear contiguously in the sorted collect, h['c']
        # rows each); chunk by the cap so the driver pull stays bounded.
        i = 0
        while i < len(collect_bins):
            chunk, tot = [], 0
            while i < len(collect_bins) and (
                    not chunk
                    or tot + collect_bins[i][3] <= _MEDIAN_COLLECT_CAP):
                chunk.append(collect_bins[i])
                tot += collect_bins[i][3]
                i += 1
            got = sorted(row["__v"] for row in cur.where(
                binc.isin([b for b, *_ in chunk])).collect())
            if len(got) != tot:  # pragma: no cover — NaN/inf snuck in
                raise OrderStatsUnresolved("bin collect count mismatch")
            pos = 0
            for b, lo_r, taken, c in chunk:
                for r2 in taken:
                    out[r2] = float(got[pos + (r2 - lo_r - 1)])
                pos += c
    return out


def _exact_median(vdf: DataFrame, col: str, n: int, lo: float,
                  hi: float) -> float:
    """Exact median of ``vdf[col]`` (no NULLs, ``n`` rows, values within
    ``[lo, hi]``) by iterative histogram bisection — see the block
    comment above.  Falls back to ``F.median`` when the bounds are not
    finite (inf/NaN data) or the range collapses below float resolution
    while still holding > cap rows (degenerate, correctness first)."""
    if n <= 0:
        raise ValueError("_exact_median: need n >= 1")
    if not (math.isfinite(lo) and math.isfinite(hi)):
        return vdf.agg(F.median(col)).collect()[0][0]
    if lo == hi:
        return float(lo)
    pos = 0.5 * (n - 1)
    rlo, rhi = int(math.floor(pos)), int(math.ceil(pos))
    cur = vdf.select(F.col(col).alias("__v"))
    rank_off = 0          # values < the current [lo, hi] range
    hv: float | None = None  # rank-rhi value once known exactly
    for _ in range(64):
        w = (hi - lo) / _MEDIAN_BINS
        if not (w > 0):   # range under float resolution — see docstring
            med = cur.agg(F.median("__v")).collect()[0][0]
            return float(med)
        binc = F.least(F.floor((F.col("__v") - F.lit(lo)) / F.lit(w)),
                       F.lit(_MEDIAN_BINS - 1)).cast("int")
        hist = (cur.groupBy(binc.alias("b"))
                .agg(F.count(F.lit(1)).alias("c"),
                     F.min("__v").alias("mn"), F.max("__v").alias("mx"))
                .orderBy("b").collect())
        cum, blo, before = rank_off, None, rank_off
        for h in hist:
            if cum + h["c"] > rlo:
                blo, before = h, cum
                break
            cum += h["c"]
        in_bin_end = before + blo["c"]  # first rank past blo
        if hv is None and rhi >= in_bin_end:
            # rlo is blo's last element; rhi is the NEXT nonempty bin's
            # minimum — exact from the histogram, no extra job.
            hv = float(next(h["mn"] for h in hist if h["b"] > blo["b"]))
        if blo["mn"] == blo["mx"]:
            lv = float(blo["mn"])
            if hv is None:
                hv = lv
            break
        if blo["c"] <= _MEDIAN_COLLECT_CAP:
            arr = sorted(r["__v"] for r in cur.where(
                (F.col("__v") >= F.lit(float(blo["mn"])))
                & (F.col("__v") <= F.lit(float(blo["mx"])))).collect())
            lv = float(arr[rlo - before])
            if hv is None:
                hv = float(arr[rhi - before])
            break
        # narrow to blo's actual value range ([mn, mx] ⊆ the bin's
        # interval, so the range predicate IS the bin predicate — and it
        # pushes down to the scan) and re-histogram.
        lo, hi = float(blo["mn"]), float(blo["mx"])
        rank_off = before
        cur = (vdf.select(F.col(col).alias("__v"))
               .where((F.col("__v") >= F.lit(lo))
                      & (F.col("__v") <= F.lit(hi))))
    else:  # pragma: no cover — 64 halvings always resolve doubles
        return vdf.agg(F.median(col)).collect()[0][0]
    return lv if rlo == rhi else 0.5 * lv + 0.5 * hv


def mad_summary(df: DataFrame, col: str, k: float = 3.0) -> DataFrame:
    """Robust outlier screen — ONE summary row ``(n, med, mad,
    n_outliers)``: exact median, exact median-absolute-deviation, and
    the count of rows with ``|x − med| > k·mad``.  The data-quality
    companion to the mean/stddev profile: a single fat-finger value
    drags a z-score gate's own threshold, while median/MAD have a 50%
    breakdown point — the standard robust screen for numeric corpus
    columns (prices, token counts, latencies).

    NULLs are excluded everywhere (n counts non-NULL rows).  All three
    passes are exact: the two scalar medians come from the
    histogram-bisection selection above (``_exact_median`` —
    bit-identical to ``F.median``, but whole-stage-codegen scans
    instead of the boxed Percentile buffer) and ride the deviation
    pass as literals — cheaper and simpler than threading two scalar
    subqueries through a crossJoin, at the cost of being eager.  The
    outlier compare is single-op IEEE arithmetic on both engines (one
    subtract, one multiply), so the row hash-replays; a degenerate
    ``mad = 0`` (> half the values identical) flags every value not
    exactly equal to the median — documented, standard MAD behavior
    (use a floor upstream if that is too strict for discrete
    columns)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    vals = df.select(F.col(col).alias("__x")).where(
        F.col("__x").isNotNull())
    st = vals.agg(F.count(F.lit(1)).alias("n"), F.min("__x").alias("lo"),
                  F.max("__x").alias("hi")).collect()[0]
    if st["n"] == 0:
        return tiny_df(
            df.sparkSession, [(0, None, None, 0)],
            "n long, med double, mad double, n_outliers long")
    n, lo, hi = int(st["n"]), float(st["lo"]), float(st["hi"])
    med = _exact_median(vals, "__x", n, lo, hi)
    dev = vals.select(F.abs(F.col("__x") - F.lit(float(med)))
                      .alias("__d"))
    # deviations live in [0, max(med−lo, hi−med)]: IEEE rounding is
    # monotone and |lo−med| == med−lo exactly (negation is exact).
    dhi = (max(med - lo, hi - med)
           if math.isfinite(lo) and math.isfinite(hi)
           and math.isfinite(med) else float("nan"))
    mad = _exact_median(dev, "__d", n, 0.0, dhi)
    row = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.lit(float(med)).alias("med"),
        F.lit(float(mad)).alias("mad"),
        F.sum(F.when(F.abs(F.col("__x") - F.lit(float(med)))
                     > F.lit(float(k)) * F.lit(float(mad)),
                     F.lit(1)).otherwise(F.lit(0)))
        .cast("long").alias("n_outliers"))
    return row
