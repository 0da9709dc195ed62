"""Streaming corpus-drift monitor — term-distribution TVD per micro-batch.

The batch drift report (``operators/stats.term_drift`` /
``tvd_summary``) answers "did the mix move?" between two snapshots.  A
rolling ingest needs the same answer CONTINUOUSLY: after every
micro-batch, how far has the accumulated corpus drifted from the pinned
reference distribution (yesterday's corpus, the training mix the model
was tuned on)?  This module maintains that series with the module's
standard ``foreachBatch`` + partitioned-parquet-store contract.

Layout under ``monitor_dir`` (plain partitioned parquet):

* ``reference/``            — the pinned reference vocab counts
  ``(term, c)``, written ONCE when the monitor first runs; later runs
  must not pass a different reference (the series would silently
  change meaning), so a reference re-supply is ignored once pinned.
* ``counts/batch_id=N/``    — each micro-batch's exact ``(term, c)``
  counts.  Pre-aggregated vocab tables, never documents: the store
  grows with |vocab|·batches, not corpus size.
* ``drift/batch_id=N/``     — one row per batch:
  ``(batch_id, tvd_num, n_corpus, n_ref)`` where the CUMULATIVE corpus
  (all batches up to and including N) has
  ``TVD = tvd_num / (2·n_corpus·n_ref)`` against the reference — the
  same exact-integer surface as ``corpus_drift_tvd``, so the series
  hash-compares against a whole-corpus batch replay bit-for-bit.

Replay idempotence: both per-batch writes are dynamic partition
overwrites keyed on ``batch_id`` — a crash replay rewrites its own
partitions (the contract every sink in ``streaming/ingest.py`` honors).
The drift row for batch N is recomputed FROM THE COUNTS STORE, so a
replayed batch N produces the identical row even though later batches
may already exist (the cumulative fold filters ``batch_id <= N``).

Scale shape: per-batch cost is one token-count aggregate over the BATCH
plus a groupBy-sum fold over the persisted per-batch vocab tables and
one full-outer join against the reference vocab — all |vocab|-sized,
none corpus-sized.  At 100 TB the counts store is the only thing that
grows; fold it offline by summing old batches into one partition if
batch count ever matters (the same shape as the index compactors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pandas_db_spark.operators.stats import (drift_from_counts,
                                             term_counts, tvd_summary)


def _reference_counts(spark: SparkSession, monitor_dir: str,
                      reference_df: DataFrame | None,
                      text_col: str) -> DataFrame:
    """Load the pinned reference vocab, writing it exactly once."""
    from pyspark.errors import AnalysisException
    ref_path = monitor_dir + "/reference"
    try:
        return spark.read.parquet(ref_path)
    except AnalysisException as exc:
        # ONLY path-not-found means "first run"; a corrupted reference
        # or IO error must propagate — silently refitting would change
        # the series' meaning (the _read_store discipline)
        cond = exc.getCondition() if hasattr(exc, "getCondition") else None
        if not ((cond and "PATH_NOT_FOUND" in cond)
                or "Path does not exist" in str(exc)):
            raise
    if reference_df is None:
        raise ValueError(
            "drift monitor has no pinned reference at "
            f"{ref_path} and no reference_df was supplied — the first "
            "run must provide the distribution to drift against")
    term_counts(reference_df, text_col).write.mode(
        "error").parquet(ref_path)
    return spark.read.parquet(ref_path)


def append_drift_batch(batch_df: DataFrame, batch_id: int,
                       monitor_dir: str,
                       reference_df: DataFrame | None = None,
                       text_col: str = "text") -> None:
    """Fold one micro-batch into the monitor: persist its vocab counts,
    recompute the cumulative-corpus-vs-reference TVD, persist the drift
    row.  Factored out of the ``foreachBatch`` handler so the driver
    gate can replay batches deterministically without a checkpoint."""
    spark = batch_df.sparkSession
    ref = _reference_counts(spark, monitor_dir, reference_df, text_col)
    (term_counts(batch_df, text_col)
     .withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(monitor_dir + "/counts"))
    # cumulative fold FROM THE STORE, bounded at this batch id, so a
    # replay of batch N yields batch N's row even after N+1 landed
    cum = (spark.read.parquet(monitor_dir + "/counts")
           .where(F.col("batch_id") <= batch_id)
           .groupBy("term").agg(F.sum("c").alias("c")))
    row = (tvd_summary(drift_from_counts(cum, ref))
           .select(F.col("tvd_num").cast("long").alias("tvd_num"),
                   F.col("n_a").cast("long").alias("n_corpus"),
                   F.col("n_b").cast("long").alias("n_ref"))
           .withColumn("batch_id", F.lit(batch_id)))
    (row.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(monitor_dir + "/drift"))


def run_drift_monitor(stream_df: DataFrame, monitor_dir: str,
                      checkpoint_dir: str,
                      reference_df: DataFrame | None = None,
                      text_col: str = "text") -> None:
    """Drive the monitor from a document stream (availableNow drain —
    the module's standard wrapper).  ``reference_df`` is only consulted
    on the very first batch ever; thereafter the pinned reference under
    ``monitor_dir/reference`` is authoritative."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_drift_batch(batch_df, batch_id, monitor_dir,
                           reference_df, text_col)

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()


def drift_history(spark: SparkSession, monitor_dir: str) -> DataFrame:
    """The monitor's output series: one exact-integer row per drained
    batch, ascending ``batch_id``."""
    return (spark.read.parquet(monitor_dir + "/drift")
            .select("batch_id", "tvd_num", "n_corpus", "n_ref")
            .orderBy("batch_id"))


def drift_top_terms(spark: SparkSession, monitor_dir: str,
                    k: int = 20) -> DataFrame:
    """Which terms moved: the full per-term drift report of the CURRENT
    cumulative corpus vs the pinned reference, top-k by exact integer
    drift (ties broken by term so the cut is deterministic)."""
    ref = spark.read.parquet(monitor_dir + "/reference")
    cum = (spark.read.parquet(monitor_dir + "/counts")
           .groupBy("term").agg(F.sum("c").alias("c")))
    return (drift_from_counts(cum, ref)
            .orderBy(F.col("drift_num").desc(), "term").limit(k))


def vocab_top_streamed(spark: SparkSession, monitor_dir: str,
                       k: int = 50) -> DataFrame:
    """Streaming heavy hitters: the top-k terms of the cumulative
    corpus AS OF the last drained batch, served from the monitor's
    per-batch counts store — ``(term, cf)`` with the deterministic
    ``(cf DESC, term)`` tie-break.

    The store IS the sketch: each micro-batch wrote its own exact
    vocab partition, so serving is one vocab-sized ``groupBy(term)``
    fold over ``counts/`` plus a TakeOrdered — never a corpus re-scan,
    and exact (no count-min error term), replay-idempotent because the
    underlying partitions are.  Cost grows with STORE vocab, not
    corpus; ``compact_drift_counts`` folds the per-batch partitions
    when batch count dominates vocab size."""
    cum = (spark.read.parquet(monitor_dir + "/counts")
           .groupBy("term").agg(F.sum("c").alias("cf")))
    return cum.orderBy(F.col("cf").desc(), "term").limit(k)


def compact_drift_counts(spark: SparkSession, monitor_dir: str,
                         checkpoint_dir: str | None = None) -> dict:
    """Fold the monitor's per-batch fragmentation offline (one counts
    file and one drift file land per batch): both stores rewrite
    row-identically under the reserved ``batch_id=-1`` partition at one
    file each — the cumulative fold's ``batch_id <= N`` filter keeps
    including them (−1 ≤ anything), so a resumed stream composes and
    later replays of POST-compaction batches stay idempotent.  Same
    contract, machinery (Hadoop FS staging swap, crash rollback) and
    rules as the index compactors: run OFFLINE, keep the checkpoint,
    pass ``checkpoint_dir`` to refuse while a batch is
    started-but-uncommitted."""
    from pandas_db_spark.operators.similarity import (
        _assert_stream_quiesced, _compact_partitioned_dataset)
    if checkpoint_dir is not None:
        _assert_stream_quiesced(spark, checkpoint_dir)
    report = {}
    for sub in ("counts", "drift"):
        folded = _compact_partitioned_dataset(spark, monitor_dir, sub,
                                              part_col="",
                                              coalesce_one=True)
        if folded is not None:
            report[sub] = folded
    return report


def drift_alert(spark: SparkSession, monitor_dir: str,
                threshold_ppm: int) -> DataFrame:
    """Batches whose cumulative drift exceeded the budget: rows of
    :func:`drift_history` with ``TVD > threshold_ppm / 1e6`` — the
    trigger a rolling ingest wires to pause intake or page when a crawl
    shifts the mix.  The compare runs as EXACT DECIMAL(38) integer
    cross-multiplication (``tvd_num·10⁶ > thr·2·n_corpus·n_ref`` — both
    sides can exceed int64, so the int64 surface is never trusted with
    the product), keeping the alert decision bit-identical to any SQL
    replay, same as the series itself."""
    if threshold_ppm < 0:
        raise ValueError(
            f"threshold_ppm must be >= 0, got {threshold_ppm}")
    h = drift_history(spark, monitor_dir)
    d = "decimal(38,0)"
    lhs = F.col("tvd_num").cast(d) * F.lit(1_000_000).cast(d)
    rhs = (F.lit(int(threshold_ppm)).cast(d) * F.lit(2).cast(d)
           * F.col("n_corpus").cast(d) * F.col("n_ref").cast(d))
    return h.where(lhs > rhs)


# ---------------------------------------------------------------------------
# Bounded-memory streaming heavy hitters — mergeable Misra-Gries summaries
# (VERDICT r12 Next #6).  vocab_top_streamed above is EXACT but its counts
# store is vocab-sized, and at 100 TB of web text the vocab IS the data;
# this family keeps a store of AT MOST `capacity` rows per batch partition
# with a PROVEN deviation bound, mirroring the repo's exact/sketch pairing
# (median/quantile_approx, nunique/approx_count_distinct).
#
# Guarantee (Misra-Gries 1982; merge rule + proof: Agarwal, Cormode,
# Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012): with
# capacity k, every estimate satisfies
#
#     c_est(t)  <=  c_true(t)  <=  c_est(t) + err_ub,   err_ub <= N/(k+1)
#
# (terms absent from the summary have c_est = 0), because each trim that
# subtracts delta removes >= delta*(k+1) mass from the running total N.
# The store additionally records the EXACT cumulative err_ub (the sum of
# applied deltas), which is typically far below the worst-case N/(k+1).
#
# Determinism: batch counts are exact integers, the merge is a keyed sum,
# and the trim threshold is the (k+1)-th largest VALUE (never a row pick),
# so for a fixed batch split the summary is bit-identical across
# partitionings/engines and the whole fold SQL-replays — the registry's
# heavy_hitters_mg query hash-checks it against a DuckDB replay.


def mg_trim(counts: DataFrame, capacity: int) -> tuple[DataFrame, int]:
    """One Misra-Gries reduction: if ``counts`` (``term``, ``c``) has
    more than ``capacity`` rows, subtract the (capacity+1)-th largest
    count from every row and keep the positive remainder (at most
    ``capacity`` rows survive, since only counts strictly above the
    threshold stay).  Returns ``(trimmed, delta)`` — delta is the exact
    error this reduction added to every surviving/dropped estimate.

    The threshold probe is one TakeOrdered job over the count table
    (bounded: capacity+1 rows reach the driver)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    top = (counts.orderBy(F.col("c").desc()).limit(capacity + 1)
           .agg(F.count(F.lit(1)).alias("n"),
                F.min("c").alias("m")).collect()[0])
    if int(top["n"] or 0) <= capacity:
        return counts, 0
    delta = int(top["m"])
    return (counts.where(F.col("c") > delta)
            .select("term", (F.col("c") - delta).cast("long").alias("c")),
            delta)


def _read_hh_state(spark: SparkSession, store_dir: str,
                   before_batch: int) -> tuple[DataFrame | None, int, int]:
    """Latest (summary, n_tokens_cum, err_ub_cum) persisted STRICTLY
    before ``before_batch`` — a replay of batch N folds exactly the
    state batch N saw the first time, even after N+1 landed."""
    from pyspark.errors import AnalysisException
    try:
        meta = (spark.read.parquet(store_dir + "/hhmeta")
                .where(F.col("batch_id") < before_batch))
        row = meta.orderBy(F.col("batch_id").desc()).limit(1).collect()
    except AnalysisException as exc:
        cond = exc.getCondition() if hasattr(exc, "getCondition") else None
        if not ((cond and "PATH_NOT_FOUND" in cond)
                or "Path does not exist" in str(exc)):
            raise
        return None, 0, 0
    if not row:
        return None, 0, 0
    prev_id = int(row[0]["batch_id"])
    summary = (spark.read.parquet(store_dir + "/summary")
               .where(F.col("batch_id") == prev_id)
               .select("term", "c"))
    return summary, int(row[0]["n_tokens"]), int(row[0]["err_ub"])


def append_heavy_hitters_batch(batch_df: DataFrame, batch_id: int,
                               store_dir: str, capacity: int = 4096,
                               text_col: str = "text") -> None:
    """Fold one micro-batch into the bounded heavy-hitter store:
    exact batch term counts (batch-bounded, the only corpus-touching
    step) merge into the previous <=capacity-row summary by keyed sum,
    then ONE Misra-Gries trim bounds the result back to ``capacity``
    rows; the new summary and the exact cumulative ``(n_tokens,
    err_ub)`` land under ``batch_id=N`` dynamic-overwrite partitions
    (the module's replay-idempotent sink contract).

    Store size: <= capacity rows per batch partition + a 1-row meta —
    FLAT in corpus size and vocab size, the property the exact monitor
    store can't have.  Old partitions serve only replay determinism;
    prune them offline to the latest if batch count ever matters (the
    compact_drift_counts note)."""
    spark = batch_df.sparkSession
    prev, prev_n, prev_err = _read_hh_state(spark, store_dir, batch_id)
    batch_counts = term_counts(batch_df, text_col)
    batch_n = int(batch_counts.agg(
        F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0])
    if prev is None:
        merged = batch_counts
    else:
        merged = (prev.withColumnRenamed("c", "c_a")
                  .join(batch_counts.withColumnRenamed("c", "c_b"),
                        "term", "full_outer")
                  .select("term",
                          (F.coalesce("c_a", F.lit(0))
                           + F.coalesce("c_b", F.lit(0)))
                          .cast("long").alias("c")))
    summary, delta = mg_trim(merged, capacity)
    (summary.withColumn("batch_id", F.lit(batch_id))
     .coalesce(1).write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(store_dir + "/summary"))
    meta = spark.createDataFrame(
        [(prev_n + batch_n, prev_err + delta, batch_id)],
        "n_tokens long, err_ub long, batch_id long")
    (meta.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(store_dir + "/hhmeta"))


def run_heavy_hitter_ingest(stream_df: DataFrame, store_dir: str,
                            checkpoint_dir: str, capacity: int = 4096,
                            text_col: str = "text") -> None:
    """Drive the bounded heavy-hitter store from a document stream
    (availableNow drain — the module's standard wrapper)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_heavy_hitters_batch(batch_df, batch_id, store_dir,
                                   capacity, text_col)

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()


def heavy_hitters_topk(spark: SparkSession, store_dir: str,
                       k: int = 50) -> DataFrame:
    """Top-k heavy hitters AS OF the last drained batch —
    ``(term, c_low)`` with the deterministic ``(c_low DESC, term)``
    tie-break, served from the LATEST <=capacity-row summary partition
    only (partition-pruned read; never a corpus or vocab scan).
    ``c_low`` is the Misra-Gries lower bound: true count is within
    ``err_ub`` above it (see :func:`heavy_hitters_meta`)."""
    from pyspark.sql.functions import max as smax
    latest = (spark.read.parquet(store_dir + "/hhmeta")
              .agg(smax("batch_id")).collect()[0][0])
    return (spark.read.parquet(store_dir + "/summary")
            .where(F.col("batch_id") == int(latest))
            .select("term", F.col("c").alias("c_low"))
            .orderBy(F.col("c_low").desc(), "term").limit(k))


def heavy_hitters_meta(spark: SparkSession, store_dir: str) -> DataFrame:
    """The per-batch guarantee ledger: ``(batch_id, n_tokens, err_ub)``
    cumulative rows, ascending.  For every term, ``c_low <= c_true <=
    c_low + err_ub``; ``err_ub <= n_tokens / (capacity + 1)`` by the
    Misra-Gries bound, and the stored value is the exact (usually far
    smaller) sum of applied trim deltas."""
    return (spark.read.parquet(store_dir + "/hhmeta")
            .select("batch_id", "n_tokens", "err_ub")
            .orderBy("batch_id"))


# ---------------------------------------------------------------------------
# Streaming distinct-count store — one mergeable HLL sketch row per batch.
# The cardinality companion to the heavy hitters above: "how large is the
# vocab so far?" without storing the vocab (the exact monitor's counts
# store answers it at vocab-sized cost; this answers it at ~KB/batch).
# Spark's built-in DataSketches HLL functions (hll_sketch_agg /
# hll_union_agg / hll_sketch_estimate) do the work JVM-side; register
# merges are max-based, so the sketch and its estimate are independent
# of row order and partitioning — deterministic for a fixed batch split.


def append_distinct_sketch_batch(batch_df: DataFrame, batch_id: int,
                                 store_dir: str, text_col: str = "text",
                                 lg_k: int = 12) -> None:
    """Fold one micro-batch into the distinct-token sketch store: ONE
    row ``(sk: binary, n_tokens: long)`` lands under
    ``sketches/batch_id=N`` (dynamic overwrite — the module's
    replay-idempotent contract).  ``lg_k`` fixes the sketch's register
    count (2^lg_k; relative standard error ~1.04/sqrt(2^lg_k), ~1.6%
    at the default 12) and must be the same for every batch of a
    store."""
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    toks = batch_df.select(F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"))
    row = toks.agg(
        F.hll_sketch_agg("term", F.lit(lg_k)).alias("sk"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"))
    (row.withColumn("lg_k", F.lit(lg_k))
        .withColumn("batch_id", F.lit(batch_id))
        .coalesce(1).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(store_dir + "/sketches"))


def distinct_estimate(spark: SparkSession, store_dir: str) -> DataFrame:
    """Cumulative distinct-token estimate AS OF the last drained batch:
    one row ``(n_batches, n_tokens, estimate)`` — a union-merge of the
    per-batch sketches (one tiny job over n_batches KB-sized rows,
    never a vocab or corpus scan)."""
    sk = spark.read.parquet(store_dir + "/sketches")
    return sk.agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long").alias("estimate"))


def run_distinct_sketch_ingest(stream_df: DataFrame, store_dir: str,
                               checkpoint_dir: str,
                               text_col: str = "text",
                               lg_k: int = 12) -> None:
    """Drive the sketch store from a document stream (availableNow
    drain — the module's standard wrapper)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_distinct_sketch_batch(batch_df, batch_id, store_dir,
                                     text_col, lg_k)

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()


# ---------------------------------------------------------------------------
# Streaming quantile monitor — bounded equi-width histogram store.
# The latency/value-percentile companion to the stores above: per batch,
# ONE <= (n_bins + 2)-row bin-count table lands under batch_id=N; serving
# folds the bins and answers any quantile with a PROVEN bracket (the true
# quantile lies inside the answered bin, so the error is at most one bin
# width for in-range data).  Everything is exact integers over fixed IEEE
# bin arithmetic, so both the store and the served bounds are
# bit-deterministic and SQL-replayable — unlike a GK/KLL sketch, whose
# compaction order would defeat a value oracle.  The trade is declared up
# front: the value domain [lo, hi) and resolution are fixed at store
# creation; out-of-range values land in visible underflow (-1) /
# overflow (n_bins) bins rather than silently clamping.


def append_histogram_batch(batch_df: DataFrame, batch_id: int,
                           store_dir: str, value_col: str,
                           lo: float, hi: float,
                           n_bins: int = 256) -> None:
    """Fold one micro-batch's values into the histogram store:
    ``bin = floor((v - lo) / width)`` for v in [lo, hi), -1 below,
    ``n_bins`` at-or-above; NULLs are dropped.  The per-batch counts
    (<= n_bins + 2 rows) land under ``hist/batch_id=N`` dynamic
    overwrite — the module's replay-idempotent contract.  ``lo``, ``hi``
    and ``n_bins`` must be identical for every batch of a store (the
    bins ARE the schema); they are persisted beside the counts and
    enforced on append."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    if not 1 <= n_bins <= 65536:
        raise ValueError(f"n_bins must be in [1, 65536], got {n_bins}")
    spark = batch_df.sparkSession
    from pyspark.errors import AnalysisException
    geom_path = store_dir + "/geometry"
    try:
        g = spark.read.parquet(geom_path).collect()[0]
        if (float(g["lo"]), float(g["hi"]), int(g["n_bins"])) != \
                (float(lo), float(hi), int(n_bins)):
            raise ValueError(
                "histogram store geometry mismatch: store has "
                f"(lo={g['lo']}, hi={g['hi']}, n_bins={g['n_bins']}), "
                f"append asked (lo={lo}, hi={hi}, n_bins={n_bins}) — "
                "the bins are the store's schema; build a new store to "
                "change them")
    except AnalysisException as exc:
        cond = exc.getCondition() if hasattr(exc, "getCondition") else None
        if not ((cond and "PATH_NOT_FOUND" in cond)
                or "Path does not exist" in str(exc)):
            raise
        spark.createDataFrame(
            [(float(lo), float(hi), int(n_bins))],
            "lo double, hi double, n_bins int").write.mode(
            "error").parquet(geom_path)
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_expr = (F.when(v < F.lit(float(lo)), F.lit(-1))
                .when(v >= F.lit(float(hi)), F.lit(n_bins))
                # least() guards the FP edge where (v-lo)/width rounds
                # up to n_bins for v just under hi
                .otherwise(F.least(
                    F.floor((v - F.lit(float(lo))) / F.lit(width)),
                    F.lit(n_bins - 1)))).cast("int")
    counts = (batch_df.where(v.isNotNull())
              .groupBy(bin_expr.alias("bin"))
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    (counts.withColumn("batch_id", F.lit(batch_id))
     .coalesce(1).write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(store_dir + "/hist"))


def histogram_quantile_bounds(spark: SparkSession, store_dir: str,
                              qs: list) -> DataFrame:
    """Served quantile brackets over the cumulative store: for each q
    in ``qs`` (0 < q <= 1), the row ``(q_ppm, bin, bin_lo, bin_hi, n)``
    where the value of rank ``ceil(q*n)`` falls in ``bin`` — so
    ``bin_lo <= quantile_q < bin_hi`` exactly (NULL bounds for the
    underflow/overflow bins, whose presence means the answer left the
    declared domain).  The rank is computed in EXACT integer ppm
    arithmetic (``ceil(q_ppm*n/10^6)`` as an integer ceil-div, never a
    float product — a double ``0.9*10000`` lands at 9000.000000000002
    and would off-by-one the rank), so the serve is engine-exact.  One
    tiny job: the fold is <= n_bins + 2 rows per batch partition, never
    the value stream."""
    if not qs or not all(0 < q <= 1 for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    from pyspark.sql import Window
    g = spark.read.parquet(store_dir + "/geometry").collect()[0]
    lo, hi, n_bins = float(g["lo"]), float(g["hi"]), int(g["n_bins"])
    width = (hi - lo) / n_bins
    cum = (spark.read.parquet(store_dir + "/hist")
           .groupBy("bin").agg(F.sum("c").alias("c"))
           .withColumn("cum", F.sum("c").over(
               Window.orderBy("bin")
               .rowsBetween(Window.unboundedPreceding, 0))))
    qdf = spark.createDataFrame(
        [(int(round(q * 1_000_000)),) for q in qs], "q_ppm long")
    n = F.max(F.col("cum")).over(Window.partitionBy())
    # integer ceil-div (DIV, not /: the float path loses exactness past
    # 2^53 — q_ppm*n reaches 1e18 at a trillion rows, still inside int64)
    rank = F.expr("(q_ppm * n + 999999) DIV 1000000")
    ranked = (cum.crossJoin(qdf)
              .withColumn("n", n)
              .where(F.col("cum") >= rank))
    first = (ranked.groupBy("q_ppm")
             .agg(F.min("bin").alias("bin"),
                  F.max("n").cast("long").alias("n")))
    bin_lo = F.when(F.col("bin") >= 0,
                    F.lit(lo) + F.col("bin") * F.lit(width))
    bin_hi = F.when(F.col("bin") < n_bins,
                    F.lit(lo) + (F.col("bin") + 1) * F.lit(width))
    return (first.select("q_ppm", "bin",
                         bin_lo.cast("double").alias("bin_lo"),
                         bin_hi.cast("double").alias("bin_hi"), "n")
            .orderBy("q_ppm"))


def run_histogram_ingest(stream_df: DataFrame, store_dir: str,
                         checkpoint_dir: str, value_col: str,
                         lo: float, hi: float,
                         n_bins: int = 256) -> None:
    """Drive the histogram store from a stream (availableNow drain —
    the module's standard wrapper)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_histogram_batch(batch_df, batch_id, store_dir,
                               value_col, lo, hi, n_bins)

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()


# ---------------------------------------------------------------------------
# Store lifecycle for the r13 monitors — same contract family as
# compact_drift_counts / compact_index: run OFFLINE, keep the streaming
# checkpoint, pass checkpoint_dir to refuse while a batch is
# started-but-uncommitted.  Two shapes, matched to each store's read path:
#
# * the HH store SERVES from the latest batch partition only, so old
#   partitions PRUNE (replay determinism needs the immediately-previous
#   partition, hence keep_last >= 2 by default);
# * the sketch store FOLDS over all rows at serve time, so fragmentation
#   compacts row-identically (the drift-counts shape).


def prune_heavy_hitter_store(spark: SparkSession, store_dir: str,
                             keep_last: int = 2,
                             checkpoint_dir: str | None = None) -> dict:
    """Delete heavy-hitter batch partitions older than the newest
    ``keep_last`` from BOTH ``summary/`` and ``hhmeta/`` (one aligned
    cutoff — a summary without its meta, or vice versa, would break the
    guarantee ledger).  Serving only ever reads the latest partition
    and a replayed batch N folds the state at N-1, so ``keep_last=2``
    preserves both; older partitions exist purely as history.  All
    filesystem ops go through the Hadoop ``FileSystem`` API (HDFS/S3A
    real).  Returns ``{"deleted": ..., "kept": ...}``."""
    if keep_last < 2:
        raise ValueError(
            f"keep_last must be >= 2 (serving reads the latest "
            f"partition, a replay of batch N reads N-1), got {keep_last}")
    from pandas_db_spark.operators.similarity import (
        _assert_stream_quiesced, _fs_for)
    if checkpoint_dir is not None:
        _assert_stream_quiesced(spark, checkpoint_dir)
    fs, P = _fs_for(spark, store_dir)
    ids: set[int] = set()
    for sub in ("summary", "hhmeta"):
        p = P(store_dir.rstrip("/") + "/" + sub)
        if not fs.exists(p):
            return {"deleted": 0, "kept": 0}
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("batch_id="):
                ids.add(int(name.split("=", 1)[1]))
    keep = set(sorted(ids)[-keep_last:])
    deleted = 0
    for sub in ("summary", "hhmeta"):
        for bid in ids - keep:
            p = P(store_dir.rstrip("/") + f"/{sub}/batch_id={bid}")
            if fs.exists(p):
                if not fs.delete(p, True):
                    raise IOError(f"prune: delete of {p} failed")
                deleted += 1
    return {"deleted": deleted, "kept": len(keep)}


def compact_sketch_store(spark: SparkSession, store_dir: str,
                         checkpoint_dir: str | None = None) -> dict:
    """Fold the distinct-sketch store's per-batch fragmentation (one
    KB-sized file lands per batch) row-identically into the reserved
    ``batch_id=-1`` partition — the serve path unions ALL rows, so the
    fold changes nothing it reads; a resumed stream appends fresh
    non-negative batch ids beside it and composes (the
    compact_drift_counts contract; replays of PRE-compaction batch ids
    are forbidden by the quiesce rule, same as there)."""
    from pandas_db_spark.operators.similarity import (
        _assert_stream_quiesced, _compact_partitioned_dataset)
    if checkpoint_dir is not None:
        _assert_stream_quiesced(spark, checkpoint_dir)
    report = _compact_partitioned_dataset(spark, store_dir, "sketches",
                                          part_col="",
                                          coalesce_one=True)
    return {"sketches": report} if report is not None else {}
