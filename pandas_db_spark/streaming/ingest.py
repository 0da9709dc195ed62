"""Streaming dedup ingest — the rolling-corpus pipeline, end to end.

Every micro-batch of incoming documents is (1) deduped IN-BATCH —
exact keep-min-id in both modes, plus in-batch near-dup pairs at the
same threshold in ``mode="near"`` — then (2) deduped against the
ACCUMULATED store of everything ingested before it, then (3) survivors
are appended to the corpus sink and their state appended to the store —
so the corpus never admits a document it has already seen, across
batches, restarts and days.  This
is the composition the whole dedup module builds toward:
``foreachBatch`` + :func:`operators.dedup.dedup_incremental` +
:func:`operators.dedup.fingerprint_store`.

Why ``foreachBatch`` and not a stateful operator: the dedup state (one
digest per EVER-ingested doc) must outlive the streaming query and be
shared with batch jobs — a parquet store does both; Spark's own
``dropDuplicatesWithinWatermark`` (see ``streaming/dedup.py``) bounds
its state by TIME and forgets, which is the right tool within a stream
but not across a corpus's lifetime.

Exactly-once note (honest, not hand-waved): ``foreachBatch`` gives
at-least-once on restart — a batch can replay after a crash.  The
replayed batch deduplicates against the store it already wrote, so
CORPUS duplicates cannot arise from replays of LATER batches; the
dangerous case is a crash BETWEEN the corpus append and the store
append, which replays that batch's rows with an empty store entry.
``partition_by_batch=True`` (default) closes it: the corpus write AND
every store write (exact fingerprints, near sigs/docs, embedding
keys/vecs — r9, per ADVICE r8) are batch-id-partitioned DYNAMIC
overwrites, so a replayed batch_id rewrites its own partitions
idempotently instead of appending a second copy (crash-replay asserted
in ``tests/test_streaming.py``).  With ``partition_by_batch=False``
the stores stay plain at-least-once appends — duplicate rows after a
replay are harmless to the anti-join semantics (they only inflate
candidate probes) and compactable offline
(:func:`operators.similarity.compact_signlsh_store`).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F

from pandas_db_spark.session import tiny_df


def _read_store(spark, path: str, schema: str) -> DataFrame:
    """Load a persisted dedup-state table, treating ONLY path-not-found as
    'first batch ever'.  A corrupted store or transient IO/permission error
    must propagate — silently falling back to an empty store would re-admit
    every previously-seen document into the corpus.  A missing path whose
    ``.__stage_old`` sibling EXISTS is an interrupted staged rewrite
    (reband/compact crashed between renames), not a first batch: raise and
    name the recovery instead of silently emptying the store (r9)."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        cond = exc.getCondition() if hasattr(exc, "getCondition") else None
        if (cond and "PATH_NOT_FOUND" in cond) or \
                "Path does not exist" in str(exc):
            try:
                from pandas_db_spark.operators.similarity import _fs_for
                fs, P = _fs_for(spark, path)
                stale = fs.exists(P(path.rstrip("/") + ".__stage_old"))
            except Exception:
                stale = False
            if stale:
                raise RuntimeError(
                    f"dedup store table {path} is missing but its "
                    ".__stage_old sibling exists — a staged rewrite "
                    "(reband_store / compaction) crashed mid-swap.  Run "
                    "operators.similarity.recover_staged(spark, path) "
                    "(or re-run the migration) before ingesting; "
                    "treating this as an empty store would re-admit "
                    "every previously-seen document.") from exc
            return spark.createDataFrame([], schema)
        raise


def run_dedup_ingest(stream_df: DataFrame, text_col: str, id_col: str,
                     corpus_dir: str, store_dir: str,
                     checkpoint_dir: str,
                     partition_by_batch: bool = True,
                     mode: str = "exact",
                     threshold: float = 0.8,
                     vec_dim: int = 64,
                     expected_corpus: int = 1_000_000,
                     auto_migrate: bool = False,
                     span_k: int = 8, span_w: int = 4,
                     eval_bloom=None, bloom_ngram: int = 8,
                     bloom_min_shared: int = 1,
                     quality_screen: bool = False,
                     screens: list | None = None) -> None:
    """Drive the ingest over all available input (availableNow trigger).

    ``corpus_dir`` receives surviving documents (parquet, appended);
    ``store_dir`` the dedup state.  Both readable by any batch job
    between runs; re-running with new input continues where the store
    left off.

    ``mode="exact"`` (default): store = (digest, id) fingerprints,
    a new doc is dropped only on exact normalized-text identity.
    ``mode="near"``: store = (id, sig) MinHash signatures
    (:func:`operators.dedup.minhash_store`); a new doc is dropped when
    its exact-verified Jaccard vs ANY stored doc reaches ``threshold`` —
    NOTE the verify step re-shingles matched store docs, so the near
    mode also persists the store docs' id+text beside the signatures
    (``store_dir + "/docs"``), read back only for candidates.
    ``mode="span"`` (r9): store = winnowed k-gram fingerprints
    (:func:`operators.dedup.winnow_store`, ``span_k``/``span_w``) plus
    the store docs' id+text (``store_dir + "/docs"``, read back only
    for candidates); a new doc is dropped when it shares ≥ 1 exact
    ``span_k``-token span with ANY stored doc.  Recall contract,
    layer by layer: VERBATIM duplicates of any length are caught by an
    exact-digest store (``store_dir + "/digests"``, same state as
    ``mode="exact"``); partial shared spans ≥ span_k+span_w-1 tokens
    are guaranteed by the winnowed fingerprint probe; partial shared
    runs of span_k..span_k+span_w-2 tokens may be admitted across
    batches (``span_w`` trades store size for that floor — span_w=1
    indexes every position).  Every span drop is exact-verified on
    gram strings.  In-batch, a doc sharing a span with a smaller-id
    batch doc is dropped via the every-position gram index (exact at
    ``span_k``, :func:`operators.dedup.span_dup_ids`).
    ``mode="embedding"`` (r8): ``text_col`` names an ``array<float>``
    VECTOR column (``vec_dim`` components); store = sign-LSH band keys
    (``similarity.signlsh_store``) + the vectors beside them, and a new
    vector is dropped when its exact-verified cosine vs ANY stored
    vector reaches ``threshold`` (pass 0.95-ish — the 0.8 default is
    the near-text convention).  The band geometry is sized ONCE from
    ``expected_corpus`` via ``auto_sign_geometry`` and PINNED in
    ``store_dir + "/meta"`` — keys from different geometries never
    match, so every later batch (and crash replay) reloads the pinned
    values; size ``expected_corpus`` for the corpus you expect at
    steady state, not the first batch.  When the stored corpus passes
    the pinned design density the ingest WARNS each batch (candidate
    volume drifts quadratic past the pin); with ``auto_migrate=True``
    it instead re-bands the store BEFORE the stream starts — geometry
    re-sized for 2x the current corpus via
    :func:`operators.similarity.reband_store` (one vector scan, keys
    swapped in place, meta re-pinned) — which is safe exactly because
    it runs before any micro-batch is in flight.

    ``eval_bloom`` (r9): a ``(words, m_bits, k_hashes)`` Bloom filter
    from :func:`operators.decontam.build_ngram_bloom` — every batch is
    DECONTAMINATED before dedup: docs sharing ≥ ``bloom_min_shared``
    distinct ``bloom_ngram``-grams with the Bloom'd eval set are
    dropped at ingest, so contaminated documents never reach the corpus
    or the dedup stores.  Join-free probe (broadcast bitmap, only hit
    rows shuffle); zero false negatives by construction.  Text modes
    only (exact/near/span — the embedding mode carries no text).

    ``quality_screen=True`` (r9) additionally drops documents failing
    the Gopher rule stack (:func:`functions.text.gopher_flags` — the
    filter order every published pipeline uses: screens BEFORE dedup,
    so junk neither costs dedup work nor seeds the stores).  Narrow
    scan-level predicate, no extra pass.  Text modes only.

    ``screens`` (r11): an ordered list of composable per-batch screens
    (``DataFrame -> DataFrame`` callables — see
    :mod:`streaming.screens` for the URL / blocklist / C4 factories),
    applied FIRST, in order, before ``quality_screen`` and the Bloom
    decontamination.  Each must be stateless and per-row deterministic
    (the replay-idempotence contract documented there); corpus-GLOBAL
    stages like ``strip_common_paragraphs`` are batch jobs over the
    accumulated corpus, not screens."""
    from pandas_db_spark.operators.dedup import (dedup_incremental,
                                                 exact_dedup_keep,
                                                 fingerprint_store,
                                                 keep_first,
                                                 minhash_incremental,
                                                 minhash_pairs,
                                                 minhash_store,
                                                 span_dup_ids,
                                                 span_incremental,
                                                 winnow_store)
    from pandas_db_spark.operators.similarity import (auto_sign_geometry,
                                                      cosine_incremental,
                                                      cosine_pairs_lsh,
                                                      signlsh_store)

    if mode not in ("exact", "near", "embedding", "span"):
        raise ValueError(f"run_dedup_ingest: unknown mode {mode!r}")
    if eval_bloom is not None and mode == "embedding":
        raise ValueError("run_dedup_ingest: eval_bloom needs a text "
                         "column; the embedding mode carries vectors")
    if quality_screen and mode == "embedding":
        raise ValueError("run_dedup_ingest: quality_screen needs a text "
                         "column; the embedding mode carries vectors")

    if auto_migrate and mode == "embedding":
        # Pre-stream migration window: no micro-batch is in flight, so
        # re-keying the store here honors reband_store's offline
        # contract.  The new pin (2x current) gives headroom so the
        # migration amortizes over the next corpus doubling.
        spark0 = stream_df.sparkSession
        meta0 = _read_store(spark0, store_dir + "/meta",
                            "bands long, rows long, expected_corpus long")
        rows0 = meta0.collect()
        if rows0:
            pin0 = (int(rows0[0]["expected_corpus"])
                    if "expected_corpus" in meta0.columns
                    and rows0[0]["expected_corpus"] is not None
                    else expected_corpus)
            stored0 = _read_store(
                spark0, store_dir + "/vecs",
                "__id long").count()
            if stored0 > pin0:
                from pandas_db_spark.operators.similarity import reband_store
                reband_store(spark0, store_dir, threshold=threshold,
                             expected_corpus=max(2 * stored0, pin0),
                             id_col=id_col, vec_col=text_col, dim=vec_dim)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        for screen in (screens or ()):
            batch_df = screen(batch_df)
        if quality_screen:
            from pandas_db_spark.functions.text import gopher_flags
            batch_df = batch_df.where(
                gopher_flags(F.col(text_col))["gopher_keep"])
        if eval_bloom is not None:
            # decontaminate BEFORE dedup: flagged docs must not reach
            # the corpus NOR seed the dedup stores (a contaminated doc
            # in the store would otherwise shadow-drop clean near-dups
            # of itself in later batches while itself being gone)
            from pandas_db_spark.operators.decontam import (
                bloom_contaminated)
            flagged = (bloom_contaminated(batch_df, eval_bloom, text_col,
                                          id_col, bloom_ngram,
                                          bloom_min_shared)
                       .select(F.col("train_id").alias(id_col)))
            batch_df = batch_df.join(flagged, id_col, "left_anti")
        if mode == "exact":
            store = _read_store(spark, store_dir, "digest string, id long")
            # dedup_incremental dedupes IN-BATCH (keep-min-id groupBy)
            # before anti-joining the store.
            kept_ids = dedup_incremental(batch_df, store, text_col, id_col)
        elif mode == "embedding":
            meta_df = _read_store(
                spark, store_dir + "/meta",
                "bands long, rows long, expected_corpus long")
            meta_rows = meta_df.collect()
            vecs = _read_store(spark, store_dir + "/vecs",
                               f"{id_col} long, {text_col} array<float>")
            keys = _read_store(spark, store_dir + "/keys",
                               "id long, band long, bh long")
            stored_n = vecs.count()
            if meta_rows:
                bands = int(meta_rows[0]["bands"])
                rows = int(meta_rows[0]["rows"])
                # pre-r9 metas carry no expected_corpus column → fall
                # back to the run parameter for the growth check
                pin = (int(meta_rows[0]["expected_corpus"])
                       if "expected_corpus" in meta_df.columns
                       and meta_rows[0]["expected_corpus"] is not None
                       else expected_corpus)
            elif stored_n > 0:
                # keys/vecs exist but the geometry pin is gone (e.g. a
                # crash during a meta rewrite): re-pinning a FRESH
                # geometry here would silently mismatch every stored
                # band key and admit all duplicates — fail loudly and
                # point at the repair
                raise RuntimeError(
                    f"dedup ingest store at {store_dir} has {stored_n} "
                    "vectors but no geometry pin in /meta — the store is "
                    "mid-migration or its meta write crashed.  Run "
                    "operators.similarity.reband_store(store_dir, ...) "
                    "to re-key and re-pin it before ingesting.")
            else:
                # first batch ever: pin the geometry for the store's life
                # (a crash replay re-derives the identical values from
                # the same expected_corpus, so the pin is idempotent)
                bands, rows = auto_sign_geometry(expected_corpus, threshold)
                pin = expected_corpus
                (tiny_df(spark, [(bands, rows, expected_corpus)],
                         "bands long, rows long, expected_corpus long")
                 .write.mode("overwrite").parquet(store_dir + "/meta"))
            # Growth guard (r9): once the stored corpus outgrows the
            # geometry pin's design density, random-pair candidates
            # drift back toward ~n²·bands/2^rows and dedup cost goes
            # quadratic SILENTLY.  One cheap row-count per batch buys
            # the warning; the escape hatch is the offline
            # similarity.reband_store migration.
            if stored_n > pin:
                import warnings
                warnings.warn(
                    f"dedup ingest store at {store_dir} holds "
                    f"{stored_n} vectors — past its pinned design "
                    f"density of {pin} (bands={bands}, rows={rows}); "
                    "candidate volume is drifting quadratic.  Run "
                    "operators.similarity.reband_store(store_dir, "
                    "expected_corpus=<new steady-state size>) between "
                    "ingest runs to migrate the geometry.",
                    RuntimeWarning, stacklevel=2)
            # ONE sign pass per batch (r10): the batch's band keys are
            # computed and PERSISTED once, then shared by all three
            # consumers — in-batch pair generation, the store probe and
            # the store append below.  Before this the same Arrow
            # matmul pass ran once per consumer (the top term of the
            # profiled ~6 s/batch dedup lineage).
            batch_keys = signlsh_store(batch_df, id_col=id_col,
                                       vec_col=text_col, dim=vec_dim,
                                       bands=bands, rows=rows).persist()
            # in-batch near-dedup FIRST (cosine_incremental only compares
            # the batch against the store)
            in_pairs = cosine_pairs_lsh(batch_df, threshold=threshold,
                                        id_col=id_col, vec_col=text_col,
                                        keyed=batch_keys)
            batch_kept = keep_first(batch_df, in_pairs, id_col)
            kept_keys = batch_keys.join(
                F.broadcast(batch_kept.select(F.col(id_col).alias("id"))),
                "id", "left_semi")
            kept_ids = cosine_incremental(
                batch_kept, vecs, id_col=id_col, vec_col=text_col,
                threshold=threshold, dim=vec_dim, bands=bands, rows=rows,
                store_keys=keys, new_keys=kept_keys)
        elif mode == "span":
            fps = _read_store(spark, store_dir + "/fps",
                              f"fp long, {id_col} long")
            docs = _read_store(spark, store_dir + "/docs",
                               f"{id_col} long, {text_col} string")
            digests = _read_store(spark, store_dir + "/digests",
                                  "digest string, id long")
            # Exact-digest layer FIRST (r9 review): winnowing needs
            # span_k+span_w-1 tokens to emit a fingerprint, so a
            # VERBATIM duplicate of a shorter document would slip the
            # store probe entirely; the digest layer (same state as
            # mode='exact') catches verbatim copies of any length, and
            # dedup_incremental also dedupes exact copies in-batch.
            exact_ids = dedup_incremental(batch_df, digests,
                                          text_col, id_col)
            batch_ex = batch_df.join(F.broadcast(exact_ids), id_col,
                                     "left_semi")
            # In-batch span dedup next (span_incremental only probes the
            # store): every-position gram index, drop any doc sharing a
            # span whose canonical owner (min id) is another batch doc —
            # exact at span_k, no winnowing gap inside a micro-batch.
            batch_kept = batch_ex.join(
                span_dup_ids(batch_ex, text_col, id_col, span_k),
                id_col, "left_anti")
            kept_ids = span_incremental(
                batch_kept, docs, text_col, id_col,
                k=span_k, w=span_w, store_fps=fps)
        else:
            sigs = _read_store(spark, store_dir + "/sigs",
                               f"{id_col} long, sig array<long>")
            docs = _read_store(spark, store_dir + "/docs",
                               f"{id_col} long, {text_col} string")
            # In-batch dedup FIRST (minhash_incremental only compares new
            # docs against the store): exact keep-min-id, then in-batch
            # near-dup pairs with the same threshold, keep-first policy.
            # Without this, two near-identical docs arriving in the same
            # micro-batch would BOTH be admitted.
            exact_ids = exact_dedup_keep(batch_df, text_col, id_col)
            batch_kept = batch_df.join(F.broadcast(exact_ids), id_col,
                                       "left_semi")
            in_pairs = minhash_pairs(batch_kept, text_col, id_col,
                                     threshold=threshold, persist=False)
            batch_kept = keep_first(batch_kept, in_pairs, id_col)
            kept_ids = minhash_incremental(
                batch_kept, docs, text_col, id_col,
                threshold=threshold, store_sigs=sigs,
                eager_cleanup=True)
        # ONE materialization of the dedup lineage per batch (r10, per
        # VERDICT r9 #4): the corpus sink plus every store sink below
        # are separate write ACTIONS, and without a persist each one
        # re-executes the full kept lineage — in embedding mode that is
        # two sign-band numpy passes, the store-key probe join and the
        # exact verify, re-run three times per micro-batch (measured
        # ~22 s/batch flat; the re-execution, not the store probe, was
        # the cost).  The persisted frame is one micro-batch's
        # survivors — bounded by batch size, never the store.
        kept = base_kept = (
            batch_df.join(F.broadcast(kept_ids), id_col, "left_semi")
            .persist())
        if partition_by_batch:
            # Idempotent replay: dynamic partition overwrite replaces ONLY
            # the partitions present in this batch's data, so a replayed
            # batch_id rewrites its own partition instead of appending a
            # second copy (the crash-between-corpus-and-store-append case).
            kept = kept.withColumn("batch_id", F.lit(batch_id))
            (kept.write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id").parquet(corpus_dir))
        else:
            kept.write.mode("append").parquet(corpus_dir)
        kept = kept.drop("batch_id")

        def store_write(df: DataFrame, path: str) -> None:
            # Replay-idempotent store appends (r9, per ADVICE r8): the
            # same batch-id-partitioned dynamic overwrite as the corpus
            # sink, so a crash between the corpus write and the store
            # write replays into the batch's OWN partition instead of
            # double-appending (duplicate store rows were semantically
            # harmless but inflated candidate probes over time).  With
            # partition_by_batch=False the store stays plain append —
            # at-least-once, compactable via compact_signlsh_store /
            # an offline dropDuplicates.
            if partition_by_batch:
                (df.withColumn("batch_id", F.lit(batch_id))
                   .write.mode("overwrite")
                   .option("partitionOverwriteMode", "dynamic")
                   .partitionBy("batch_id").parquet(path))
            else:
                df.write.mode("append").parquet(path)

        if mode == "exact":
            store_write(fingerprint_store(kept, text_col, id_col),
                        store_dir)
        elif mode == "embedding":
            # survivors' keys come from the SHARED persisted batch-key
            # frame (filtered by id), not a third sign pass
            surv_keys = batch_keys.join(
                F.broadcast(kept.select(F.col(id_col).alias("id"))),
                "id", "left_semi")
            store_write(surv_keys, store_dir + "/keys")
            store_write(kept.select(id_col, text_col),
                        store_dir + "/vecs")
        elif mode == "span":
            store_write(winnow_store(kept, text_col, id_col,
                                     k=span_k, w=span_w),
                        store_dir + "/fps")
            store_write(kept.select(id_col, text_col),
                        store_dir + "/docs")
            store_write(fingerprint_store(kept, text_col, id_col),
                        store_dir + "/digests")
        else:
            store_write(minhash_store(kept, text_col, id_col),
                        store_dir + "/sigs")
            store_write(kept.select(id_col, text_col),
                        store_dir + "/docs")
        if mode == "embedding":
            batch_keys.unpersist()
        base_kept.unpersist()

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()


def run_ivf_index_ingest(stream_df: DataFrame, index_dir: str,
                         checkpoint_dir: str, nlist: int = 16,
                         sample_n: int = 2048,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         design_corpus: int | None = None) -> None:
    """Maintain a SERVABLE IVF index from a vector stream (r11): the
    streaming complement of :func:`operators.similarity.build_ivf_index`
    — every micro-batch is assigned against the index's PINNED coarse
    centroids and appended, so ``ivf_topk_indexed`` serves the corpus
    as of the last drained batch with no rebuild in the loop.

    Geometry pin: the FIRST batch fits the centroids
    (``_fit_centroids`` on its hash-order sample) and writes
    ``/centroids`` once; every later batch — and every crash REPLAY of
    the first batch, which re-derives the identical centroids from the
    identical data — reloads the pin.  Keys from different geometries
    never mix (the sign-LSH ``/meta`` discipline); refreshing the
    geometry is the explicit offline rebuild.

    Replay idempotence: vectors write with dynamic partition overwrite
    under ``batch_id=N/list_id=M`` two-level layout, so a replayed
    micro-batch rewrites its OWN partitions instead of double-appending
    (the contract every store sink in :func:`run_dedup_ingest` honors).
    Serving prunes on ``list_id`` across every batch directory —
    partition filters apply to any partition column regardless of
    nesting — and :func:`operators.similarity.compact_index` is the
    offline fold for file-count growth: it detects this two-level
    layout and folds everything into the reserved ``batch_id=-1``
    partition (real batch ids are non-negative, so a resumed stream
    composes cleanly and partition depths never mix); pass this
    stream's ``checkpoint_dir`` so compaction verifies the stream is
    quiesced first.  KEEP the checkpoint across compaction — resetting
    it replays the source into a corpus the compacted partition already
    holds.

    Growth: appends FATTEN lists while ``nlist`` stays pinned; pass
    ``design_corpus`` to get a per-batch warning once the indexed count
    exceeds it (the embedding dedup mode's density-guard shape), then
    rebuild with a larger ``nlist`` offline."""
    from pandas_db_spark.operators.similarity import (_assign_lists,
                                                      _fit_centroids,
                                                      _read_pinned_centroids)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        try:
            cent = _read_pinned_centroids(spark, index_dir)
        except ValueError:
            cent = _fit_centroids(batch_df, nlist, sample_n,
                                  id_col, vec_col)
            (tiny_df(spark, [(i, c.tolist()) for i, c in enumerate(cent)],
                     "list_id long, centroid array<double>")
             .write.mode("overwrite")
             .parquet(index_dir + "/centroids"))
        if design_corpus is not None:
            indexed = _read_store(spark, index_dir + "/vectors",
                                  f"{id_col} long").count()
            if indexed > design_corpus:
                import warnings
                warnings.warn(
                    f"IVF index at {index_dir} holds {indexed} vectors — "
                    f"past its design corpus of {design_corpus} with "
                    f"nlist={nlist} pinned; per-probe scan cost grows "
                    "linearly.  Rebuild offline with a larger nlist "
                    "(build_ivf_index), then resume the stream.",
                    RuntimeWarning, stacklevel=2)
        lists = (_assign_lists(batch_df, cent, id_col, vec_col)
                 .join(batch_df, id_col)
                 .withColumn("batch_id", F.lit(batch_id)))
        (lists.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id", "list_id")
              .parquet(index_dir + "/vectors"))

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()


def run_bm25_index_ingest(stream_df: DataFrame, index_dir: str,
                          checkpoint_dir: str, text_col: str = "text",
                          id_col: str = "doc_id",
                          n_buckets: int = 32) -> None:
    """Maintain a SERVABLE BM25 text index from a document stream
    (r12): the text-retrieval complement of :func:`run_ivf_index_ingest`
    — every micro-batch's postings land under
    ``postings/batch_id=N/tbucket=B`` and its exact-integer corpus
    scalars under ``meta/batch_id=N`` via
    :func:`operators.retrieval.append_bm25_stream_batch`, so
    ``bm25_topk_streamed`` serves the corpus as of the last drained
    batch with no rebuild in the loop and term probes prune to
    ~|query terms|/n_buckets of the postings across all batch dirs.

    Replay idempotence: both writes use dynamic partition overwrite
    keyed on ``batch_id`` — a crash replay rewrites its own partitions
    (the contract every sink in this module honors).  ``n_buckets`` is
    pinned geometry: serve with the same value.  Unlike the catalog
    ``append_inverted_index`` there is no per-batch table swap, so the
    ingest loop is two partitioned writes per batch; the trade is that
    per-term df is counted at SERVE time from the pruned probe rows
    (bounded by the probe, not the corpus) instead of being
    pre-merged.  File-count growth (one file per touched tbucket per
    batch) folds OFFLINE with
    :func:`operators.retrieval.compact_bm25_stream_index` — same
    quiesce/keep-the-checkpoint contract as ``compact_index``."""
    from pandas_db_spark.operators.retrieval import append_bm25_stream_batch

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_bm25_stream_batch(batch_df, batch_id, index_dir,
                                 text_col, id_col, n_buckets)

    qr = (stream_df.writeStream.foreachBatch(handle)
          .option("checkpointLocation", checkpoint_dir)
          .trigger(availableNow=True).start())
    try:
        qr.processAllAvailable()
    finally:
        qr.stop()
