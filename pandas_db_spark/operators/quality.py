"""Declarative data-quality expectations (Deequ-style constraint suite).

Reference scope: pandas-db has no validation surface; a 100 TB ingest
pipeline cannot live without one (a single corrupt partition poisons a
training run days later).  This is the standard "expectations" pattern
from the public Deequ / Great Expectations literature, re-expressed as
ONE Spark aggregate.

Scale shape — the whole suite is a single job over a single scan:

* every ROW-level rule (not_null / in_range / in_set / matches / custom)
  folds to one ``SUM(CASE WHEN ...)`` inside ONE ``df.agg(...)`` — Spark
  evaluates all of them in the same whole-stage-codegen pass, so N rules
  cost one table scan, not N;
* ``unique`` rules add a ``count(*) - count(DISTINCT keys)`` term to the
  SAME aggregate (Catalyst plans distinct-within-agg via Expand — still
  one scan, one shuffle of the key columns only);
* the one-row aggregate is then unpivoted to one row per rule with a
  ``stack`` projection — pure plan, no driver collect, so the result is
  a lazy DataFrame you can union across tables or write to a sink.

Violation contract (documented, not configurable magic): a row violates
a row-level rule when its condition is NOT TRUE — i.e. FALSE **or
NULL**.  ``in_range(col, ...)`` therefore counts NULLs as violations;
pair it with ``allow_null=True`` to skip NULLs (condition wrapped in
``col IS NULL OR ...``).  ``unique`` counts every row beyond the first
occurrence of a duplicated key (``count(*) - count(distinct)``; NULL
keys are excluded from the distinct count, matching SQL semantics, so
NULL-keyed rows all count as violations — add a not_null rule on the
key to see them separately).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation.  ``kind`` is 'row' (boolean condition per row),
    'unique' (key-cardinality check), or 'ref' (referential
    integrity against a dimension key set)."""
    name: str
    kind: str                      # 'row' | 'unique' | 'ref'
    cols: tuple[str, ...] = ()
    _cond: Column | None = field(default=None, compare=False)
    _ref: tuple | None = field(default=None, compare=False)


def not_null(col: str) -> Rule:
    return Rule(f"not_null:{col}", "row", (col,),
                F.col(col).isNotNull())


def in_range(col: str, lo, hi, allow_null: bool = False) -> Rule:
    cond = F.col(col).between(F.lit(lo), F.lit(hi))
    if allow_null:
        cond = F.col(col).isNull() | cond
    return Rule(f"in_range:{col}", "row", (col,), cond)


def in_set(col: str, values: Sequence, allow_null: bool = False) -> Rule:
    cond = F.col(col).isin(list(values))
    if allow_null:
        cond = F.col(col).isNull() | cond
    return Rule(f"in_set:{col}", "row", (col,), cond)


def matches(col: str, pattern: str, allow_null: bool = False) -> Rule:
    """Full-match regex (RLIKE is substring-anchored only if the pattern
    anchors itself — callers pass an explicitly anchored pattern when
    they mean full match)."""
    cond = F.col(col).rlike(pattern)
    if allow_null:
        cond = F.col(col).isNull() | cond
    return Rule(f"matches:{col}", "row", (col,), cond)


def custom(name: str, cond: Column) -> Rule:
    """Arbitrary boolean Column; violation = NOT TRUE (false or null)."""
    return Rule(f"custom:{name}", "row", (), cond)


def unique(*cols: str) -> Rule:
    if not cols:
        raise ValueError("unique: need at least one key column")
    return Rule(f"unique:{','.join(cols)}", "unique", tuple(cols))


def references(col: str, dim_df: DataFrame, dim_col: str) -> Rule:
    """Referential integrity: every NON-NULL ``col`` value must appear
    in ``dim_df[dim_col]`` — violations are orphaned foreign keys
    (NULL FKs are not violations; that is :func:`not_null`'s job, and
    conflating them hides which contract broke).

    Plan: the dimension's distinct key set left-joins onto the fact
    BEFORE the single aggregate pass, adding one marker column per ref
    rule — small dims broadcast (AQE decides), so the suite stays one
    scan of the fact table; a ref rule is the only rule kind that can
    add a shuffle, and only when the dimension is genuinely large.
    The dim subtree is evaluated as part of the same lazy plan — no
    collect, no driver-side set."""
    return Rule(f"references:{col}->{dim_col}", "ref", (col,),
                None, (dim_df, dim_col))


def check_expectations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Run the suite in ONE aggregate pass; returns a lazy DataFrame
    ``(rule string, violations long, n_rows long, ok boolean)``, one row
    per rule in input order.  (``n_rows``, not ``rows`` — the bare word
    is a window keyword in several SQL dialects.)

    100 TB note: cost is one scan + (only if a ``unique`` rule is
    present) one shuffle of the key columns.  The unpivot is a constant
    one-row projection on the driver-side plan, never a collect.
    """
    if not rules:
        raise ValueError("check_expectations: empty rule list")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"check_expectations: duplicate rule names in {names}")

    # ref rules: attach one marker column per rule via a left join of
    # the dimension's distinct keys, then count orphans in the same
    # aggregate as every other rule
    for i, r in enumerate(rules):
        if r.kind == "ref":
            dim_df, dim_col = r._ref
            keys = (dim_df.select(F.col(dim_col).alias(f"__k{i}"))
                    .where(F.col(f"__k{i}").isNotNull()).distinct()
                    .withColumn(f"__hit{i}", F.lit(1)))
            df = df.join(keys, df[r.cols[0]] == keys[f"__k{i}"],
                         "left").drop(f"__k{i}")

    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    for i, r in enumerate(rules):
        if r.kind == "row":
            # NOT TRUE (false or null) counts as a violation.
            viol = F.when(r._cond, F.lit(0)).otherwise(F.lit(1))
            aggs.append(F.sum(viol).cast("long").alias(f"__v{i}"))
        elif r.kind == "ref":
            orphan = F.when(F.col(r.cols[0]).isNotNull()
                            & F.col(f"__hit{i}").isNull(),
                            F.lit(1)).otherwise(F.lit(0))
            aggs.append(F.sum(orphan).cast("long").alias(f"__v{i}"))
        elif r.kind == "unique":
            aggs.append(
                (F.count(F.lit(1)) -
                 F.count_distinct(*[F.col(c) for c in r.cols]))
                .cast("long").alias(f"__v{i}"))
        else:  # pragma: no cover - dataclass constructors gate kinds
            raise ValueError(f"unknown rule kind {r.kind!r}")

    one = df.agg(*aggs)
    # Unpivot the one-row aggregate: stack(n, name0, v0, name1, v1, ...).
    pairs: list[Column] = []
    for i, r in enumerate(rules):
        pairs.append(F.lit(r.name))
        pairs.append(F.col(f"__v{i}"))
    stacked = one.select(
        F.stack(F.lit(len(rules)), *pairs).alias("rule", "violations"),
        F.col("__rows").alias("n_rows"))
    return stacked.select(
        "rule", "violations", "n_rows",
        (F.col("violations") == 0).alias("ok"))


def check_expectations_by(df: DataFrame, group_cols: Sequence[str],
                          rules: Sequence[Rule]) -> DataFrame:
    """Per-group expectation suite — corpus health sliced by provenance
    (source, language, ingest date): ``(group_cols..., rule, violations,
    n_rows, ok)``, one row per (group, rule).

    Same one-pass shape as :func:`check_expectations`, keyed: all row
    rules and any ``unique`` rules ride ONE ``groupBy(group_cols)``
    aggregate (one keyed shuffle with map-side partial aggregation —
    the distinct for a unique rule expands within the same job), then
    the per-group unpivot happens inside the plan.  Group count is the
    output size; at 100 TB slice by low-cardinality provenance columns,
    not by document id."""
    if not group_cols:
        raise ValueError("check_expectations_by: empty group_cols — use "
                         "check_expectations for the whole-table suite")
    if not rules:
        raise ValueError("check_expectations_by: empty rule list")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(
            f"check_expectations_by: duplicate rule names in {names}")

    for i, r in enumerate(rules):
        if r.kind == "ref":
            dim_df, dim_col = r._ref
            keys = (dim_df.select(F.col(dim_col).alias(f"__k{i}"))
                    .where(F.col(f"__k{i}").isNotNull()).distinct()
                    .withColumn(f"__hit{i}", F.lit(1)))
            df = df.join(keys, df[r.cols[0]] == keys[f"__k{i}"],
                         "left").drop(f"__k{i}")

    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    for i, r in enumerate(rules):
        if r.kind == "row":
            viol = F.when(r._cond, F.lit(0)).otherwise(F.lit(1))
            aggs.append(F.sum(viol).cast("long").alias(f"__v{i}"))
        elif r.kind == "ref":
            orphan = F.when(F.col(r.cols[0]).isNotNull()
                            & F.col(f"__hit{i}").isNull(),
                            F.lit(1)).otherwise(F.lit(0))
            aggs.append(F.sum(orphan).cast("long").alias(f"__v{i}"))
        else:  # unique within each group
            aggs.append(
                (F.count(F.lit(1)) -
                 F.count_distinct(*[F.col(c) for c in r.cols]))
                .cast("long").alias(f"__v{i}"))
    one = df.groupBy(*group_cols).agg(*aggs)

    pairs: list[Column] = []
    for i, r in enumerate(rules):
        pairs.append(F.lit(r.name))
        pairs.append(F.col(f"__v{i}"))
    stacked = one.select(
        *group_cols,
        F.stack(F.lit(len(rules)), *pairs).alias("rule", "violations"),
        F.col("__rows").alias("n_rows"))
    return stacked.select(
        *group_cols, "rule", "violations", "n_rows",
        (F.col("violations") == 0).alias("ok"))


def k_anonymize(df: DataFrame, quasi_cols: Sequence[str], k: int,
                mode: str = "suppress",
                redacted: str = "*") -> DataFrame:
    """k-anonymity over quasi-identifier columns — the release gate a
    training-data pipeline runs before publishing per-record metadata
    (who contributed, from where, when): every surviving combination of
    ``quasi_cols`` values must be shared by at least ``k`` rows, so no
    record is isolatable by those attributes (Sweeney 2002's model; the
    structured-data complement of the text-side PII redaction in
    ``functions/text``).

    ``mode="suppress"`` (default) DROPS rows whose quasi-group has
    fewer than ``k`` members; ``mode="redact"`` keeps every row but
    overwrites ALL quasi columns of under-k rows with ``redacted``
    (string quasi columns only — the redacted rows then form one
    merged group, which satisfies k-anonymity whenever it reaches size
    k; it may remain smaller, which suppress-mode callers care about,
    so redact-mode is for cardinality-preserving exports).  NULL is a
    value like any other (two NULL-city rows are the same group —
    SQL ``GROUP BY`` semantics on both engines).

    Plan shape: one map-side-combined ``groupBy(quasi_cols)`` count of
    the (small, group-cardinality-sized) combination table, broadcast
    back as a semi/anti filter — the corpus itself never shuffles, so
    this composes with any scan at any scale.  Exact integer counts:
    the survivor set hash-matches a SQL replay.
    """
    quasi = list(quasi_cols)
    if not quasi:
        raise ValueError("k_anonymize: quasi_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k_anonymize: k must be >= 1, got {k}")
    if mode not in ("suppress", "redact"):
        raise ValueError(
            f"k_anonymize: mode must be 'suppress' or 'redact', "
            f"got {mode!r}")
    groups = df.groupBy(*quasi).agg(F.count(F.lit(1)).alias("__gn"))
    small = groups.where(F.col("__gn") < k).drop("__gn")
    if mode == "suppress":
        # null-safe anti join: NULL quasi values must match themselves
        cond = None
        for c in quasi:
            eq = df[c].eqNullSafe(small[c])
            cond = eq if cond is None else cond & eq
        return df.join(F.broadcast(small), cond, "left_anti")
    # rename the (self-join-derived) small side so column refs stay
    # unambiguous under Spark's self-join lineage check
    sm = small.select(*[F.col(c).alias(f"__q_{i}")
                        for i, c in enumerate(quasi)],
                      F.lit(1).alias("__small"))
    flag = None
    for i, c in enumerate(quasi):
        eq = F.col(c).eqNullSafe(F.col(f"__q_{i}"))
        flag = eq if flag is None else flag & eq
    marked = df.join(F.broadcast(sm), flag, "left")
    out_cols = []
    for c in df.columns:
        if c in quasi:
            out_cols.append(
                F.when(F.col("__small").isNotNull(), F.lit(redacted))
                .otherwise(F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return marked.select(*out_cols)


def k_anonymize_generalize(df: DataFrame, quasi_cols: Sequence[str],
                           ladder_col: str, k: int,
                           max_level: int = 8,
                           base: int = 2) -> DataFrame:
    """k-anonymity by GLOBAL RECODING instead of suppression: coarsen
    one ordered quasi column (``ladder_col``, integral) by the minimal
    power-of-``base`` level at which EVERY (quasi_cols..., coarsened)
    group reaches ``k`` members, then publish every row at that level —
    no record is dropped, utility degrades uniformly, and the released
    table is k-anonymous by construction (Sweeney's generalization
    lattice, restricted to one ladder so the minimum is total-ordered
    and unique).  Level L maps ``v -> v div base^L``.

    Returns the input with ``ladder_col`` replaced by its coarsened
    value plus a ``gen_level`` column (the chosen L, identical on every
    row).  Raises if even ``max_level`` cannot reach ``k`` — the caller
    must then suppress (:func:`k_anonymize`) or widen the ladder.

    Plan shape: all candidate levels are evaluated in ONE pass — a
    single ``GROUPING SETS`` aggregate over (quasi..., level-L bucket)
    for L = 0..max_level (one shuffle, map-side combined), folded to
    the per-level minimum group size; the chosen level applies as a
    zero-shuffle projection.  Exact integers throughout, so the
    released table and the chosen level hash-match a SQL replay.
    """
    quasi = list(quasi_cols)
    if k < 1:
        raise ValueError(f"k_anonymize_generalize: k must be >= 1, "
                         f"got {k}")
    if max_level < 0 or base < 2:
        raise ValueError("k_anonymize_generalize: need max_level >= 0 "
                         f"and base >= 2, got {max_level}, {base}")
    lvl_cols = [
        F.expr(f"{ladder_col} div {base ** lv}").alias(f"__l{lv}")
        for lv in range(max_level + 1)]
    src = df.select(*df.columns, *lvl_cols)
    sets = ", ".join(
        "(" + ", ".join([*quasi, f"__l{lv}"]) + ")"
        for lv in range(max_level + 1))
    src.createOrReplaceTempView("__kgen_src")
    try:
        # grouping(__lL) = 0 marks the rows of level L's grouping set —
        # the NULL-proof discriminator (a NULL-filled __lL can't tell a
        # level apart from a genuinely-NULL ladder value)
        mins = src.sparkSession.sql(
            "SELECT count(*) AS __gn, " + ", ".join(
                f"grouping(__l{lv}) AS __g{lv}"
                for lv in range(max_level + 1))
            + f" FROM __kgen_src GROUP BY GROUPING SETS ({sets})")
        per_level = [
            F.min(F.when(F.col(f"__g{lv}") == 0, F.col("__gn")))
            .alias(f"__m{lv}") for lv in range(max_level + 1)]
        row = mins.agg(*per_level).collect()[0]
    finally:
        src.sparkSession.catalog.dropTempView("__kgen_src")
    chosen = None
    for lv in range(max_level + 1):
        m = row[f"__m{lv}"]
        if m is not None and m >= k:
            chosen = lv
            break
    if chosen is None:
        raise ValueError(
            f"k_anonymize_generalize: no level <= {max_level} reaches "
            f"k={k} (min group size at the coarsest level: "
            f"{row[f'__m{max_level}']}); suppress instead or widen "
            "the ladder")
    out_cols = [
        F.expr(f"{ladder_col} div {base ** chosen}").alias(ladder_col)
        if c == ladder_col else F.col(c) for c in df.columns]
    return df.select(*out_cols,
                     F.lit(chosen).cast("int").alias("gen_level"))


def l_diversify(df: DataFrame, quasi_cols: Sequence[str],
                sensitive_col: str, l: int) -> DataFrame:
    """l-diversity release gate (Machanavajjhala 2007 — the k-anonymity
    companion): suppress rows whose quasi-identifier group carries
    fewer than ``l`` DISTINCT values of ``sensitive_col``, closing the
    homogeneity attack k-anonymity alone permits (a size-k group that
    is all one disease value still leaks it).  NULL sensitive values do
    not count toward diversity (SQL count-distinct semantics); NULL
    quasi tuples group together, as in :func:`k_anonymize`.

    Same plan shape as :func:`k_anonymize`: one map-side-combined
    ``groupBy(quasi)`` with a distinct-count (Expand within the same
    job), the small failing-group table broadcast back as a null-safe
    anti join — the corpus never shuffles."""
    quasi = list(quasi_cols)
    if not quasi:
        raise ValueError("l_diversify: quasi_cols must be non-empty")
    if l < 1:
        raise ValueError(f"l_diversify: l must be >= 1, got {l}")
    groups = (df.groupBy(*quasi)
              .agg(F.count_distinct(F.col(sensitive_col))
                   .alias("__nd")))
    bad = groups.where(F.col("__nd") < l).drop("__nd")
    cond = None
    for c in quasi:
        eq = df[c].eqNullSafe(bad[c])
        cond = eq if cond is None else cond & eq
    return df.join(F.broadcast(bad), cond, "left_anti")


def t_closeness_report(df: DataFrame, quasi_cols: Sequence[str],
                       sensitive_col: str) -> DataFrame:
    """t-closeness report (Li et al. 2007 — the third rung of the
    k-anonymity / l-diversity ladder): for every quasi-identifier group,
    the total-variation distance between the group's ``sensitive_col``
    distribution and the whole table's, as EXACT INTEGERS —
    ``(quasi_cols..., tvd_num, n_group, n_total)`` with
    ``TVD = tvd_num / (2·n_group·n_total)`` ∈ [0, 1] left to the caller
    (the ``term_drift`` discipline: integer cross-multiplication makes
    the report order-independent and SQL-hash-replayable; a group whose
    TVD exceeds the release budget t still leaks its members' sensitive
    skew even when k-anonymous and l-diverse).

    The absent-value mass is handled in closed form: values the group
    never takes contribute ``Σ_miss C_v·n_g = n_g·(N − Σ_present C_v)``,
    so ONE aggregate over the (quasi, sensitive) count table suffices —
    no dense group×value matrix is ever built.  NULL sensitive values
    are a category like any other (SQL GROUP BY), unlike l-diversity's
    distinct-count which ignores them.

    Plan: one ``groupBy(quasi, sensitive)`` count (map-side combined),
    per-value corpus counts and the total attached as one-row/broadcast
    joins, one ``groupBy(quasi)`` fold — the corpus shuffles once.
    Overflow: every cross product is ≤ n_total²; guarded at
    ``n_total < 2³¹`` (≈2 billion rows — shard the report or switch to
    DECIMAL(38) past that)."""
    quasi = list(quasi_cols)
    if not quasi:
        raise ValueError("t_closeness_report: quasi_cols must be "
                         "non-empty")
    from pandas_db_spark.plans.checkpoint import truncate_lineage
    gv = truncate_lineage(df.groupBy(*quasi, sensitive_col)
                   .agg(F.count(F.lit(1)).alias("__c")))
    n_total = int(gv.agg(F.sum("__c")).collect()[0][0] or 0)
    if n_total >= 2 ** 31:
        raise ValueError(
            f"t_closeness_report: n_total={n_total} makes c*N exceed "
            "2^62 — shard the report or use DECIMAL arithmetic")
    cv = (gv.groupBy(sensitive_col)
          .agg(F.sum("__c").alias("__cv"))
          .withColumnRenamed(sensitive_col, "__sv"))
    j = gv.join(F.broadcast(cv),
                F.col(sensitive_col).eqNullSafe(F.col("__sv")))
    # the |c·N − C_v·n_g| term needs n_g per row — attach it first;
    # the join must be NULL-SAFE or NULL-valued quasi groups vanish
    ng = gv.groupBy(*quasi).agg(F.sum("__c").alias("n_group")).select(
        *[F.col(c).alias(f"__g_{i}") for i, c in enumerate(quasi)],
        "n_group")
    cond = None
    for i, c in enumerate(quasi):
        eq = F.col(c).eqNullSafe(F.col(f"__g_{i}"))
        cond = eq if cond is None else cond & eq
    j2 = j.join(F.broadcast(ng), cond)
    rep = (j2.groupBy(*quasi)
           .agg(F.first("n_group").alias("n_group"),
                F.sum(F.abs(F.col("__c") * F.lit(n_total)
                            - F.col("__cv") * F.col("n_group")))
                .alias("__present"),
                F.sum("__cv").alias("__cov")))
    tvd = (F.col("__present")
           + F.col("n_group") * (F.lit(n_total) - F.col("__cov")))
    return rep.select(*quasi, tvd.cast("long").alias("tvd_num"),
                      F.col("n_group").cast("long").alias("n_group"),
                      F.lit(n_total).cast("long").alias("n_total"))
