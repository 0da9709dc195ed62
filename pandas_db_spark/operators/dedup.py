"""Deduplication operators for LLM training-data pipelines.

Five families, all **bucketed/banded — never an all-pairs cross join** (the
100 TB requirement: candidate generation must shuffle by a key whose buckets
are small, and only verify within buckets):

* exact dedup          — normalize → sha2 digest → hash groupBy (1 shuffle)
* n-gram Jaccard       — inverted-index join on shared shingles → exact verify
* MinHash-LSH          — 128-perm signatures → 32 bands × 4 rows → band-join
                         → exact Jaccard verify (banding is a *recall-loss-free
                         candidate filter* at these parameters: a pair with
                         J ≥ 0.8 misses all 32 bands with prob (1-0.8⁴)³² ≈ 5e-8)
* SimHash              — 64-bit sign-aggregated signature → 16-bit band join
                         → Hamming cutoff → exact Jaccard verify
* embedding cosine     — see operators/similarity.py (sign-LSH banding)

Everything is built from JVM higher-order array functions (`transform`,
`aggregate`, `array_intersect`) — no Python in the hot path.  Signatures are
computed in one narrow pass; the only shuffles are the band/bucket joins and
the final distinct, all keyed.

Scale levers exposed as parameters:
* ``max_df`` — drop shingles occurring in more than ``max_df`` documents
  before the inverted-index join (stopword-shingle skew cap; trades exactness
  for bounded bucket size — with MinHash banding instead, no cap is needed).
* band/row counts — recall/cost dial per the standard S-curve.

The reference has no dedup surface (its API stops at whole-column aggregates,
reference pandasdb/column.py:174-304); this module is the beyond-parity
mandate over the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_db_spark.functions.text import word_shingles

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def normalized_text(text: F.Column) -> F.Column:
    """Canonical form for exact duplicate detection: lowercase, trim,
    collapse whitespace runs."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def exact_dedup_keep(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """IDs that survive exact dedup: group by the sha2 of the normalized
    text, keep the smallest id per group.

    Plan: project → partial min per partition → one hash shuffle on the
    256-bit digest (uniform, unskewable) → final min.  At 100 TB this is the
    cheapest possible dedup — one shuffle of (digest, id) pairs, never the
    documents themselves."""
    digest = F.sha2(normalized_text(F.col(text_col)), 256)
    return (df.select(digest.alias("__digest"), F.col(id_col))
              .groupBy("__digest")
              .agg(F.min(id_col).alias(id_col))
              .select(id_col))


# ---------------------------------------------------------------------------
# shingling (shared)
# ---------------------------------------------------------------------------


def shingle_sets(df: DataFrame, text_col: str, id_col: str,
                 n: int = 3) -> DataFrame:
    """(id, shingles: array<string>) — distinct n-word shingles per doc."""
    return df.select(
        F.col(id_col),
        word_shingles(F.col(text_col), n).alias("shingles"),
    )


def _verify_pairs(cand: DataFrame, sh: DataFrame, id_col: str,
                  threshold: float) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to their shingle sets and keep
    pairs with exact Jaccard ≥ threshold.  |A∩B| and |A∪B| are integers, the
    quotient a single correctly-rounded double division → bit-stable."""
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    joined = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union
    return (joined.select("id_a", "id_b", jac.alias("jaccard"))
                  .filter(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------


def jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                  threshold: float = 0.8, n: int = 3,
                  max_df: int | None = None) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via an **inverted-index join**:
    explode shingles → self-join on the shingle → distinct candidate pairs →
    exact verify.  Any pair with J ≥ threshold shares ≥ 1 shingle, so with
    ``max_df=None`` this is exact, at the cost of skew on very common
    shingles; set ``max_df`` to cap posting-list length (or use
    :func:`minhash_pairs`, whose bucket sizes don't depend on shingle
    frequency)."""
    sh = shingle_sets(df, text_col, id_col, n)
    posting = sh.select(F.col(id_col), F.explode("shingles").alias("sh"))
    if max_df is not None:
        freq = posting.groupBy("sh").count().filter(F.col("count") <= max_df)
        posting = posting.join(freq.select("sh"), "sh")
    left = posting.select(F.col(id_col).alias("id_a"), "sh")
    right = posting.select(F.col(id_col).alias("id_b"), "sh")
    cand = (left.join(right, "sh")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct())
    return _verify_pairs(cand, sh, id_col, threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(sh: DataFrame, id_col: str,
                       num_perm: int = 128) -> DataFrame:
    """(id, sig: array<long>) — sig[i] = min over shingles of
    xxhash64(shingle, i).  One narrow pass, JVM-side; the per-permutation
    seed rides as the second xxhash64 argument (no permutation tables)."""
    seeds = F.sequence(F.lit(0), F.lit(num_perm - 1))
    sig = F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(F.col("shingles"), lambda x: F.xxhash64(x, s))
        ),
    )
    return sh.select(F.col(id_col), sig.alias("sig"))


def _band_pairs(sig_df: DataFrame, id_col: str, bands: int,
                rows: int) -> DataFrame:
    """Candidate pairs sharing ≥ 1 LSH band: explode (band_idx, band_hash)
    keys, self-join on them, distinct.  The join key includes the band index,
    so bucket sizes stay |docs with identical r-row slice| — independent of
    corpus-wide term frequencies."""
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.struct(
            i.alias("band"),
            F.xxhash64(F.slice("sig", i * rows + 1, rows)).alias("bh"),
        ),
    )
    keyed = (sig_df.select(F.col(id_col), F.explode(band_structs).alias("b"))
                   .select(id_col, F.col("b.band").alias("band"),
                           F.col("b.bh").alias("bh")))
    left = keyed.select(F.col(id_col).alias("id_a"), "band", "bh")
    right = keyed.select(F.col(id_col).alias("id_b"), "band", "bh")
    return (left.join(right, ["band", "bh"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct())


def minhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  threshold: float = 0.8, n: int = 3, num_perm: int = 128,
                  bands: int = 32, rows: int = 4) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding + exact Jaccard verification.

    The verify step makes precision exact; recall is 1 - (1-t^rows)^bands —
    at the defaults ≈ 1 - 5e-8 for t = 0.8 (and higher above), so the output
    equals the exact all-pairs answer with overwhelming probability while
    scaling as Σ bucket² instead of n²."""
    sh = shingle_sets(df, text_col, id_col, n)
    sig = minhash_signatures(sh, id_col, num_perm)
    cand = _band_pairs(sig, id_col, bands, rows)
    return _verify_pairs(cand, sh, id_col, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# SimHash geometry: 28-bit signature, 4 bands × 7 bits.  By pigeonhole, any
# pair within Hamming ≤ 3 shares at least one intact band → the band join is
# a COMPLETE candidate filter for the operator's own criterion (no
# probabilistic recall).  The shingle hash is the engine-neutral polynomial
# (same as functions/text.fingerprint) so the oracle can replicate the
# signature bit-for-bit — xxhash64 variants differ across engines.
SIMHASH_BITS = 28
SIMHASH_BANDS = 4
_SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
_POLY_MOD = 2_147_483_648


def _poly_hash(s) -> F.Column:
    """Char-level polynomial hash mod 2^31 — deterministic on any engine."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda g, c: (g * 31 + F.ascii(c)) % _POLY_MOD,
    )


def simhash_signatures(sh: DataFrame, id_col: str) -> DataFrame:
    """(id, simhash) — SimHash over shingle hashes:
    bit_j = 1 iff more shingle hashes have bit j set than clear
    (2·ones > n).  One narrow JVM pass, no shuffle."""
    hashed = sh.select(
        F.col(id_col),
        F.transform("shingles", _poly_hash).alias("hs"),
    )
    def bit_set(j):
        # NB: factory, not a default-arg lambda — PySpark treats 2-parameter
        # lambdas as (element, index) in higher-order functions.
        return lambda h: F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) == 1

    sig = F.lit(0).cast("long")
    n = F.size("hs")
    for j in range(SIMHASH_BITS):
        ones = F.size(F.filter("hs", bit_set(j)))
        sig = sig + F.when(ones * 2 > n, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return hashed.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  threshold: float = 0.8, n: int = 3,
                  hamming_max: int = 3) -> DataFrame:
    """Near-dup pairs by the SimHash criterion: Hamming(simhash) ≤
    ``hamming_max`` AND exact Jaccard ≥ threshold.

    Candidates come from a 4-band join (7-bit chunks); for hamming_max ≤
    bands-1 this is lossless by pigeonhole, so the output is exactly the
    pairs satisfying the criterion — deterministic, oracle-checkable."""
    if hamming_max > SIMHASH_BANDS - 1:
        raise ValueError(
            f"hamming_max={hamming_max} breaks the pigeonhole guarantee "
            f"(must be <= {SIMHASH_BANDS - 1})")
    sh = shingle_sets(df, text_col, id_col, n)
    sig = simhash_signatures(sh, id_col)
    mask = (1 << _SIMHASH_BAND_BITS) - 1
    band_cols = [
        F.shiftrightunsigned("simhash", b * _SIMHASH_BAND_BITS)
         .bitwiseAND(F.lit(mask)).alias(f"band{b}")
        for b in range(SIMHASH_BANDS)
    ]
    sigb = sig.select(F.col(id_col), F.col("simhash"), *band_cols)
    cands = []
    for b in range(SIMHASH_BANDS):
        left = sigb.select(F.col(id_col).alias("id_a"),
                           F.col("simhash").alias("sig_a"),
                           F.col(f"band{b}").alias("bh"))
        right = sigb.select(F.col(id_col).alias("id_b"),
                            F.col("simhash").alias("sig_b"),
                            F.col(f"band{b}").alias("bh"))
        cands.append(left.join(right, "bh")
                         .filter(F.col("id_a") < F.col("id_b"))
                         .select("id_a", "id_b", "sig_a", "sig_b"))
    cand = cands[0]
    for c in cands[1:]:
        cand = cand.unionByName(c)
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    cand = (cand.filter(hamming <= hamming_max)
                .select("id_a", "id_b")
                .distinct())
    return _verify_pairs(cand, sh, id_col, threshold)


# ---------------------------------------------------------------------------
# keep-set from pairs
# ---------------------------------------------------------------------------


def keep_first(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Dedup policy: drop every id that appears as the *larger* member of a
    near-dup pair (canonical-smallest-neighbor; same deterministic rule as
    the SQL oracle).  One broadcast-or-shuffle anti-join."""
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")
