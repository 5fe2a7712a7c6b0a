"""Deduplication operators for web-scale training data.

Four families, all shuffle-conscious:

- exact:      hash-groupBy on content digest (one shuffle on the digest);
- MinHash+LSH: shingle -> P permutation-min signatures -> banded bucket join
              (signatures computed as P JVM ``min(xxhash64(shingle, seed))``
              aggregations — no Python; candidate pairs only where a band
              collides, so the pair join never goes quadratic);
- SimHash:    64 bit-vote aggregations JVM-side -> banded hamming candidates
              verified with ``bit_count(a ^ b)``;
- n-gram Jaccard: exact char-n-gram set join for candidate verification
              (used standalone at small scale, or as the LSH verify stage).

Skew note: shingle/gram explode keys are salted by construction (the join keys
are hashes — uniform); the remaining hot-key risk is a degenerate LSH bucket
(boilerplate/empty text collapsing to one band value), which is HARD-CAPPED by
``cap_hot_buckets`` before every bucket self-join — the worst bucket emits at
most max_bucket^2 pairs. At 10^12 docs the LSH band join shuffles ~P/r rows
per doc, not O(doc^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import fingerprint


def cap_hot_buckets(
    entries: DataFrame,
    key_cols: list[str],
    max_bucket: int,
    stats: dict | None = None,
) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket`` before a bucket self-join.

    The self-join is quadratic *within* a bucket, so one degenerate hot bucket
    (empty/boilerplate text hashing to the same band value) turns a linear LSH
    pass into O(n^2). Capping trades recall on pathological keys for a hard
    bound: the pair join emits at most max_bucket^2 rows per bucket. Docs in a
    dropped bucket usually still pair via their other bands (bands are
    independent), so real near-dups are rarely lost entirely.

    One window count over the same hash partitioning the self-join needs —
    the exchange is reused, so the cap adds no extra shuffle of ``entries``.

    ``stats``: optional dict — when passed, runs a small aggregate action and
    records {'dropped_buckets': n, 'dropped_rows': n} (the surfaced accounting;
    skipped by default to keep the operator lazy). NO SILENT CAPS: whenever the
    stats pass observes dropped_rows > 0, a RuntimeWarning is emitted too —
    a near-identical template cluster larger than max_bucket is hot in EVERY
    band, so its bands are all dropped and the "other bands rescue real
    near-dups" argument fails exactly for the largest real clusters. Run
    ``dedup_exact`` / ``dedup_fingerprint`` first so byte-identical piles never
    reach the LSH stage, and raise ``max_bucket`` if drops are reported.
    """
    w = Window.partitionBy(*key_cols)
    sized = entries.withColumn("_bsz", F.count(F.lit(1)).over(w))
    if stats is not None:
        row = (
            sized.filter(F.col("_bsz") > max_bucket)
            .select(*key_cols, "_bsz")
            .groupBy(*key_cols)
            .agg(F.first("_bsz").alias("_bsz"))
            .agg(
                F.count(F.lit(1)).alias("dropped_buckets"),
                F.coalesce(F.sum("_bsz"), F.lit(0)).alias("dropped_rows"),
            )
            .collect()[0]
        )
        stats["dropped_buckets"] = int(row["dropped_buckets"])
        stats["dropped_rows"] = int(row["dropped_rows"])
        stats["max_bucket"] = max_bucket
        if stats["dropped_rows"] > 0:
            import warnings

            warnings.warn(
                f"cap_hot_buckets dropped {stats['dropped_buckets']} bucket(s) "
                f"({stats['dropped_rows']} rows) above max_bucket={max_bucket}; "
                "clusters larger than max_bucket lose ALL their bands — run "
                "exact dedup first or raise max_bucket",
                RuntimeWarning,
                stacklevel=2,
            )
    return sized.filter(F.col("_bsz") <= max_bucket).drop("_bsz")


# --- exact -------------------------------------------------------------------

def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups byte-identical texts; keeps min id as canonical.

    Returns (id, canonical_id, group_size); rows with group_size == 1 are unique.
    """
    digest = F.md5(F.col(text_col)).alias("_digest")
    groups = df.select(F.col(id_col), digest)
    w_min = groups.groupBy("_digest").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        groups.join(w_min, "_digest")
        .select(id_col, "canonical_id", "group_size")
    )


def dedup_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-exact dedup on the normalized-content fingerprint (formatting-robust).

    ``hash_family='poly'`` swaps xxhash64 for the verifiable double rolling
    hash (functions/vhash.poly_fingerprint) — same normalization, same
    grouping plan, SQL-replayable for the driver oracle."""
    if hash_family == "poly":
        from ..functions.textstats import normalize_content
        from ..functions.vhash import poly_fingerprint

        fp = poly_fingerprint(normalize_content(F.col(text_col)))
    else:
        fp = fingerprint(F.col(text_col))
    groups = df.select(F.col(id_col), fp.alias("fp"))
    agg = groups.groupBy("fp").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return groups.join(agg, "fp").select(id_col, "fp", "canonical_id", "group_size")


# --- shingles / n-grams --------------------------------------------------------

def word_shingles(
    df: DataFrame, text_col: str, id_col: str, w: int = 3,
    dedup: bool = True,
) -> DataFrame:
    """Distinct w-word shingles per doc, built JVM-side (split + slice +
    explode).  ``dedup=False`` skips the per-doc distinct (and its (id,
    shingle) string shuffle) — correct whenever the consumer is a
    duplicate-insensitive aggregate (min/max), e.g. the MinHash signature
    build (r6): min over a multiset equals min over its set."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, w)))
    out = df.select(F.col(id_col), F.explode(sh).alias("shingle"))
    return out.dropDuplicates([id_col, "shingle"]) if dedup else out


def char_ngrams(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct char n-grams per doc (JVM substring fan-out)."""
    t = F.lower(F.col(text_col))
    ln = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(t, i, n))
    return (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .dropDuplicates([id_col, "gram"])
    )


# --- MinHash + LSH -------------------------------------------------------------

def _band_entries(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int,
    plain_buckets: bool = False,
) -> DataFrame:
    """(id, band, bucket) rows from (id, sig) — bands rows per doc, all JVM.
    Derived on the fly wherever needed (signatures are the durable state;
    band entries are a cheap projection of them)."""

    def _bucket(b):
        joined = F.concat_ws(",", *[
            F.element_at("sig", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ])
        return joined if plain_buckets else F.xxhash64(joined)

    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, shingle_w: int = 3, hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, sig array<long>): permutation-min signatures.

    One shuffle (groupBy id); all P mins computed in a single hash aggregate.

    ``hash_family``: 'xxhash64' (production default — P independent seeded
    hashes of the shingle) or 'poly' (verifiable family, functions/vhash.py —
    one rolling hash t per shingle, then P affine permutations
    (a_i*t+b_i) mod 2^31-1; bit-identical replayable in DuckDB SQL, so the
    driver's exact oracle covers the full signature plumbing).

    r6: shingles are NOT pre-deduplicated — min aggregation is duplicate-
    insensitive (min over a multiset == min over its set, per permutation
    and per seed), so the per-doc distinct's (id, shingle-string) shuffle
    was pure cost.  With partial map-side aggregation the one exchange
    here carries 64 longs per (doc x map task), never a shingle string.
    """
    sh = word_shingles(df, text_col, id_col, shingle_w, dedup=False)
    if hash_family == "poly":
        from ..functions.vhash import perm_min_exprs, poly_hash

        sh = sh.withColumn("_t", poly_hash(F.col("shingle")))
        mins = perm_min_exprs(F.col("_t"), num_perm)
    else:
        mins = [
            F.min(F.xxhash64("shingle", F.lit(i))).alias(f"m{i}") for i in range(num_perm)
        ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(id_col, F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16, rows_per_band: int = 4,
    max_bucket: int = 2000, bucket_stats: dict | None = None,
    plain_buckets: bool = False,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become a candidate pair (a < b).

    Scale shape: explode to bands rows/doc, shuffle on (band, hash), self-join
    within buckets only; buckets larger than ``max_bucket`` are dropped first
    (see ``cap_hot_buckets`` — bounds the worst bucket to max_bucket^2 pairs).

    ``plain_buckets``: keep the bucket as the raw comma-joined slot string
    instead of xxhash64-ing it — identical join semantics (the hash only
    shortens the shuffle key), but SQL-replayable for the oracle path.
    """
    assert bands * rows_per_band <= 1024
    band_entries = _band_entries(sigs, id_col, bands, rows_per_band, plain_buckets)
    band_entries = cap_hot_buckets(band_entries, ["band", "bucket"], max_bucket, bucket_stats)
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_jaccard_estimate(sigs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Estimated Jaccard = fraction of matching signature slots per pair."""
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size("sig_a")
    return pairs.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", est.alias("jaccard_est")
    )


def minhash_lsh_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.7, num_perm: int = 64, bands: int = 16, shingle_w: int = 3,
    max_bucket: int = 2000, bucket_stats: dict | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with estimated Jaccard >= threshold.

    ``max_bucket`` / ``bucket_stats`` plumb straight to ``cap_hot_buckets``:
    a cluster of >max_bucket near-identical docs is hot in EVERY band, so the
    cap silently drops the whole cluster unless accounting is on — pass
    ``bucket_stats={}`` (or use ``near_dedup_pipeline``, which surfaces the
    counts in the snapshot manifest) on production runs, and run
    ``dedup_exact``/``dedup_fingerprint`` FIRST so byte-identical piles never
    reach LSH."""
    from .pip_knn import _cache_scoped

    # sigs feeds THREE subtrees (band entries + both sides of the
    # estimate join) — without a persist the shingle scan + signature
    # aggregate recompute once per consumer per action (r6)
    sigs = _cache_scoped(
        "mh_sigs",
        minhash_signatures(df, text_col, id_col, num_perm, shingle_w, hash_family),
    )
    pairs = lsh_candidate_pairs(
        sigs, id_col, bands, num_perm // bands, max_bucket, bucket_stats,
        plain_buckets=(hash_family == "poly"),
    )
    est = minhash_jaccard_estimate(sigs, pairs, id_col)
    return est.filter(F.col("jaccard_est") >= threshold)


# --- exact n-gram Jaccard --------------------------------------------------------

def jaccard_for_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """EXACT char-n-gram Jaccard for a GIVEN candidate-pair list (a < b).

    The pair-scoped verify stage a 100 TB near-dedup needs: the gram table is
    joined to the pair list (per-pair fan-out ~ grams/doc), never to itself —
    no all-pairs gram join, no hot-gram quadratic blowup. Jaccard is exact
    because the FULL gram sets of both docs participate (any candidate-side
    capping upstream only affects which pairs are tested, never the score).

    Plan shape: pairs ⋈ grams(id_a) on id_a  ->  ⋈ grams(id_b) on (id_b, gram)
    -> count = |A∩B| per pair; sizes join back for the union term. Each join is
    an equi-join on (id) or (id, gram) — shuffle keys are doc ids/hashes, so
    the work is O(|pairs| x grams_per_doc), linear in the candidate list.

    Output: (id_a, id_b, jaccard) for every input pair (0.0 if no shared gram
    — pairs with disjoint gram sets survive with jaccard 0, so the caller's
    threshold filter sees every candidate it asked about).
    """
    grams = char_ngrams(df, text_col, id_col, n)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    ga = grams.select(F.col(id_col).alias("id_a"), "gram")
    gb = grams.select(F.col(id_col).alias("_gb_id"), F.col("gram").alias("_gb_gram"))
    common = (
        pairs.select("id_a", "id_b")
        .join(ga, "id_a")
        .join(
            gb,
            (F.col("id_b") == F.col("_gb_id")) & (F.col("gram") == F.col("_gb_gram")),
            "left_semi",
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        pairs.select("id_a", "id_b")
        .join(common, ["id_a", "id_b"], "left")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.coalesce(F.col("common"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("common"), F.lit(0))),
                6,
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    w: int = 3, num: int = 4, den: int = 5, max_df: int | None = None,
) -> DataFrame:
    """Asymmetric shingle-CONTAINMENT pairs (a < b): max-direction
    containment |A∩B| / min(|A|, |B|) >= num/den, decided as exact
    integers (den * inter >= num * least(sz_a, sz_b) — the rational
    cross-multiplication rule, no float score anywhere).

    The inclusion detector symmetric Jaccard misses: an excerpt or quote
    of a long document has containment ~1 but Jaccard ~|A|/|B| — the
    RefinedWeb/Gopher-style complement to ngram_jaccard_pairs. Returns
    (id_a, id_b, inter, sz_a, sz_b); the ratio stays consumer-side.

    ``max_df=None`` (exact mode): every shingle-sharing pair is scored —
    quadratic within shared-shingle groups, the evaluation regime.
    ``max_df=N``: ubiquitous shingles (doc frequency > N) are excluded
    from CANDIDATE GENERATION only (worst fan-out max_df^2 — the
    cap_hot_buckets discipline), then candidates re-score EXACTLY
    against the FULL shingle sets, so the cap can only miss a pair whose
    every shared shingle is ubiquitous, never skew a reported score."""
    grams = word_shingles(df, text_col, id_col, w)
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = grams.select(F.col(id_col).alias("id_a"), "shingle")
    b = grams.select(F.col(id_col).alias("id_b"), "shingle")
    if max_df is None:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        rare = grams.join(
            grams.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle"),
            "shingle",
            "left_semi",
        )
        cand = (
            rare.select(F.col(id_col).alias("id_a"), "shingle")
            .join(rare.select(F.col(id_col).alias("id_b"), "shingle"), "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        inter = (
            cand.join(a, "id_a")
            .join(b, ["id_b", "shingle"], "left_semi")
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
        .filter(
            F.lit(den) * F.col("inter")
            >= F.lit(num) * F.least("sz_a", "sz_b")
        )
        .select("id_a", "id_b", "inter", "sz_a", "sz_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.5, max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over char n-gram sets for all colliding pairs (a < b).

    ``max_df=None`` (exact mode): every pair sharing any gram is scored — the
    gram self-join is quadratic within shared-gram groups; ONLY safe at small
    scale or post-LSH.

    ``max_df=N`` (capped candidates): grams appearing in more than N documents
    are excluded from CANDIDATE GENERATION (a ubiquitous gram — ``'the'``,
    runs of spaces — fans out |df(gram)|^2 join rows while contributing ~zero
    Jaccard discrimination), then the surviving candidate pairs are scored
    EXACTLY via ``jaccard_for_pairs`` (full gram sets — the cap never skews a
    reported score, it can only miss a pair whose EVERY shared gram is
    ubiquitous). The worst gram now fans out at most max_df^2 rows — the
    same hard-bound discipline as ``cap_hot_buckets`` on the LSH side.
    """
    grams = char_ngrams(df, text_col, id_col, n)
    if max_df is not None:
        gram_df = grams.groupBy("gram").agg(F.count("*").alias("_df"))
        cand_grams = grams.join(
            gram_df.filter(F.col("_df") <= max_df).select("gram"), "gram", "left_semi"
        )
        a = cand_grams.select(F.col(id_col).alias("id_a"), "gram")
        b = cand_grams.select(F.col(id_col).alias("id_b"), "gram")
        cand = (
            a.join(b, "gram")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        return (
            jaccard_for_pairs(df, cand, text_col, id_col, n)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    a = grams.select(F.col(id_col).alias("id_a"), "gram")
    b = grams.select(F.col(id_col).alias("id_b"), "gram")
    common = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def cluster_pairs(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup pairs -> (id, canonical_id).

    Min-label propagation WITH POINTER JUMPING in pure DataFrame ops: each
    round every node adopts the smallest label among its neighbors, then
    shortcuts through its own label (``L(u) <- L(L(u))``, a labels-on-labels
    self-join) — so label distance to the component minimum HALVES per round
    and convergence is O(log diameter), not O(diameter).  Near-dup clusters
    are shallow (2-3 rounds either way), but geometry components
    (``radius_join.spatial_cluster``) are chain-shaped with diameters in the
    hundreds — the jump is what makes those converge in ~10 rounds.  The
    jump is sound because label values are always member ids of the same
    component and only decrease; the fixed point (labels equal across every
    edge AND self-consistent under jumping) is the component minimum.
    Input: (id_a, id_b) with id_a < id_b.

    Scale hardening (each round's work stays O(|edges|), never O(rounds^2)):
    - edges persist once (reused every round);
    - ONE eager action per round (r6): neighbor-min + TWO pointer-jump
      squarings are built as a single lazy plan over the previous round's
      materialized labels, then ``localCheckpoint``-ed once — lineage
      truncates, so round N's plan never replays rounds 1..N-1 (plan depth
      is constant; pinned by ``test_cluster_pairs_deep_chain_bounded_plan``),
      and label distance to the component minimum shrinks ~4x per round
      instead of ~2x (fewer rounds on chain-shaped geometry components);
    - the convergence probe is a scalar sum over the one checkpointed label
      frame (labels only ever DECREASE, so an unchanged exact sum == fixed
      point) — no join, no second materialization;
    - round shuffles run under ``coalesced_small_shuffles`` (iterhelp):
      post-shuffle partitions merge by size, so a few-thousand-row label
      table stops paying full-width reduce stages every round;
    - exiting via max_iters (clusters possibly split) warns loudly instead of
      silently returning.
    """
    from pyspark import StorageLevel

    from .iterhelp import coalesced_small_shuffles

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spark = pairs.sparkSession
    converged = False
    # materialize the pair pipeline + edge persist at FULL width before
    # entering the coalesced scope: the upstream candidate generator may
    # carry Arrow/pandas stages (radius_self_join, minhash banding) whose
    # reduce parallelism must not be coalesced away (r6 — measured 3x
    # regression on the minhash pair graph when this job ran in-scope)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    with coalesced_small_shuffles(spark):
        prev_sum = object()  # sentinel != any sum (None == empty-frame sum)
        for _ in range(max_iters):
            # neighbor labels: for each node, the min label among neighbors
            neigh = (
                edges.join(labels.withColumnRenamed("id", "dst"), "dst")
                .groupBy("src")
                .agg(F.min("label").alias("nlabel"))
                .withColumnRenamed("src", "id")
            )
            stepped = labels.join(neigh, "id", "left").select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
            # pointer jump, squared twice in the same plan: L <- L(L(u))
            # applied to its own result. Label values are node ids with
            # edges, so the left joins hit (coalesce guards degenerates);
            # extra compositions only accelerate convergence — labels still
            # only decrease and stay member ids, so the fixed point (the
            # component minimum) is unchanged.
            j1 = stepped.join(
                stepped.select(F.col("id").alias("label"), F.col("label").alias("_p1")),
                "label",
                "left",
            ).select("id", F.coalesce("_p1", F.col("label")).alias("label"))
            j2 = j1.join(
                j1.select(F.col("id").alias("label"), F.col("label").alias("_p2")),
                "label",
                "left",
            ).select("id", F.coalesce("_p2", F.col("label")).alias("label"))
            new_labels = j2.localCheckpoint(eager=True)
            # exact decimal sum: labels only decrease, so equal sum <=> no
            # label changed (elementwise new <= old); decimal(38,0) cannot
            # overflow for any realistic row count x int64 label
            cur_sum = new_labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).first()[0]
            labels = new_labels
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
    edges.unpersist()
    if not converged:
        import warnings

        warnings.warn(
            f"cluster_pairs hit max_iters={max_iters} without converging; "
            "clusters may be split (raise max_iters for deep chain graphs)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("id", F.col("label").alias("canonical_id"))


def near_dedup_pipeline(
    spark,
    df: DataFrame,
    table_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    max_bucket: int = 2000,
) -> dict:
    """Production near-dedup run: MinHash-LSH pairs -> connected components ->
    survivors committed as a snapshot, with the bucket-cap accounting SURFACED
    in the manifest (``metrics.lsh_cap``) — the no-silent-caps rule: a run
    that drops hot buckets records dropped_buckets/dropped_rows where an
    operator (or auditor) will actually see them, and ``cap_hot_buckets``
    warns loudly at run time too. Returns the manifest."""
    from ..sources.snapshot import write_snapshot

    stats: dict = {}
    pairs = minhash_lsh_dedup(
        df, text_col, id_col, threshold, num_perm, bands, shingle_w,
        max_bucket=max_bucket, bucket_stats=stats,
    )
    survivors = near_dedup_survivors(df, pairs, id_col)
    return write_snapshot(
        survivors, table_path, "append", metrics={"lsh_cap": stats}
    )


def incremental_near_dedup(
    spark,
    df: DataFrame,
    state_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    max_bucket: int = 2000,
    bucket_stats: dict | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dedup a NEW batch against everything previously committed — the
    daily-crawl-increment shape: re-running the global batch dedup over
    10^12 accumulated docs per increment is O(corpus) every day; this is
    O(batch + collisions).

    Durable state = the MinHash SIGNATURE table (snapshot layer; (id, sig)
    only — narrow rows; band entries are re-derived as a cheap projection,
    never stored). Per batch:

      1. signatures for the new batch (one shuffle over its shingles);
      2. candidates = new-vs-OLD (band join against the state table's
         derived entries) + new-vs-new (band self-join), both hot-bucket
         capped;
      3. estimate + threshold on the signature slots;
      4. a new doc matching ANY old doc drops; the remaining new docs
         near-dedup among themselves (components -> min-id survivors);
      5. survivors' signatures APPEND to the state table (the next batch
         sees them as old).

    Returns the surviving rows of ``df``. First batch (no state) degrades to
    the batch-global ``near_dedup_survivors`` and seeds the table.

    PRECONDITION: ``id_col`` must be globally unique across batches (it keys
    the durable signature table). Exact REDELIVERY of an id already committed
    is tolerated — such rows are anti-joined away up front (they were already
    adjudicated last batch; keeping them would fan out the estimate joins and
    append a duplicate (id, sig) state row) — but two DIFFERENT documents
    sharing an id across batches is a caller bug.
    """
    from ..sources.snapshot import read_table, write_snapshot

    from .pip_knn import _cache_scoped

    old_ids_sigs = read_table(spark, state_table)
    if old_ids_sigs is not None:
        df = df.join(old_ids_sigs.select(id_col), id_col, "left_anti")

    plain = hash_family == "poly"
    sigs_new = minhash_signatures(df, text_col, id_col, num_perm, shingle_w, hash_family)
    # scoped persist (released on the NEXT incremental call — signatures feed
    # the old-join, the self-join, both estimates AND the state commit)
    sigs_new = _cache_scoped("incremental_sigs", sigs_new)
    rpb = num_perm // bands
    entries_new = _band_entries(sigs_new, id_col, bands, rpb, plain)
    entries_new = cap_hot_buckets(entries_new, ["band", "bucket"], max_bucket, bucket_stats)

    old_sigs = old_ids_sigs
    if old_sigs is not None:
        entries_old = _band_entries(old_sigs, id_col, bands, rpb, plain)
        entries_old = cap_hot_buckets(entries_old, ["band", "bucket"], max_bucket)
        vs_old = (
            entries_new.alias("n")
            .join(
                entries_old.alias("o"),
                (F.col("n.band") == F.col("o.band"))
                & (F.col("n.bucket") == F.col("o.bucket")),
            )
            .select(
                F.col(f"n.{id_col}").alias("id_a"), F.col(f"o.{id_col}").alias("id_b")
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        est_old = minhash_jaccard_estimate(
            sigs_new.unionByName(old_sigs), vs_old, id_col
        )
        dup_vs_old = (
            est_old.filter(F.col("jaccard_est") >= threshold)
            .select(F.col("id_a").alias(id_col))
            .distinct()
        )
        fresh = df.join(dup_vs_old, id_col, "left_anti")
        sigs_fresh = sigs_new.join(dup_vs_old, id_col, "left_anti")
    else:
        fresh = df
        sigs_fresh = sigs_new

    # new-vs-new among the docs that survived the old-corpus check
    entries_fresh = _band_entries(sigs_fresh, id_col, bands, rpb, plain)
    entries_fresh = cap_hot_buckets(entries_fresh, ["band", "bucket"], max_bucket)
    a = entries_fresh.alias("a")
    b = entries_fresh.alias("b")
    nn_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    nn = minhash_jaccard_estimate(sigs_fresh, nn_pairs, id_col).filter(
        F.col("jaccard_est") >= threshold
    )
    survivors = near_dedup_survivors(fresh, nn, id_col)
    write_snapshot(
        sigs_fresh.join(survivors.select(id_col), id_col, "left_semi"),
        state_table,
        "append",
        key_cols=(id_col,),
    )
    return survivors


def near_dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Full near-dedup: cluster the pair graph, keep min-id per cluster.

    Returns df's rows minus non-canonical near-duplicates (singletons pass
    through untouched via the left join)."""
    clusters = cluster_pairs(pairs)
    return (
        df.join(clusters.withColumnRenamed("id", id_col), id_col, "left")
        .filter(F.col("canonical_id").isNull() | (F.col("canonical_id") == F.col(id_col)))
        .drop("canonical_id")
    )


# --- SimHash ---------------------------------------------------------------------

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash per doc, fully JVM-side: token hash bit votes via conditional
    sums in one aggregate. 63 bits under xxhash64 (production default; bit 63
    = sign, left 0 to keep ids positive); 31 bits under the verifiable 'poly'
    family (functions/vhash.py — every vote replayable in DuckDB SQL)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    if hash_family == "poly":
        from ..functions.vhash import poly_hash

        n_bits = 31
        toks = toks.withColumn("h", poly_hash(F.col("tok")))
    else:
        n_bits = 63
        toks = toks.withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(n_bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for i in range(n_bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select(id_col, sim.alias("simhash"))


def simhash_near_pairs(
    sh: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bands: int = 4,
    max_bucket: int = 2000, bucket_stats: dict | None = None,
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming via banded candidates
    (a pair within hamming 3 shares at least one of 4 16-bit bands); buckets
    above ``max_bucket`` are dropped (``cap_hot_buckets``) so a degenerate
    band value can't go quadratic."""
    width = 64 // bands
    entries = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bucket")
    entries = cap_hot_buckets(entries, ["band", "bucket"], max_bucket, bucket_stats)
    a = entries.alias("a")
    b = entries.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup: the cheap first pass of a crawl pipeline —
    canonicalize every URL (functions/urltools.py frozen rule set) and keep
    the min-id row per canonical key, BEFORE any content hash touches the
    payload.

    Adds ``url_canonical``, ``domain`` (registrable-domain-lite of the
    canonical host) and ``keep`` (min-id survivor flag; losers stay visible
    for funnel accounting, filter ``keep`` to materialize survivors).

    Scale: canonicalization is pure codegen (zero shuffle); the survivor
    flag is ONE shuffle keyed by the canonical string — hash-uniform at
    billions of URLs. Payloads may ride through: the window adds no sort
    spill (min over an unordered frame is a running aggregate), but at
    100 TB prefer projecting (id, url) through this and joining survivors
    back (CLAUDE.md narrow-fan-out rule).
    """
    from ..functions.urltools import canonicalize_url, registrable_domain, url_host

    u = F.col(url_col)
    keyed = df.withColumn("url_canonical", canonicalize_url(u)).withColumn(
        "domain", registrable_domain(url_host(u))
    )
    w = Window.partitionBy("url_canonical")
    return keyed.withColumn("keep", F.col(id_col) == F.min(id_col).over(w))


def prefix_jaccard_join(
    df: DataFrame, threshold_pct: int = 50,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """EXACT all-pairs Jaccard join via PREFIX FILTERING (AllPairs /
    PPJoin family) — the exact complement to the MinHash LSH path: no
    probabilistic recall loss, candidates bounded by a THEOREM instead
    of banding luck.  Sets are the distinct 3-word shingles per doc,
    canonically ordered RAREST-FIRST by global frequency (ties on the
    shingle string); if J(a, b) >= t then a and b MUST share a token in
    each one's first  |d| - ceil(t*|d|) + 1  tokens (else the overlap
    cap contradicts J >= t), so the candidate join runs only on those
    prefixes.  threshold_pct is an integer percent so the final verify
    is EXACT integer arithmetic:  100 * |inter| >= t_pct * |union|.

    Output (id_a < id_b, inter, uni) for every pair with J >= t —
    exact, no misses.  Plan: one shingle aggregate (global order), one
    per-doc rank window, a prefix-token equi-join for candidates, and a
    token join scoped to candidate docs for the exact overlap — the
    rare-first order makes hot-token prefix buckets provably small
    (a frequent token appears only in prefixes of docs where it still
    ranks early, i.e. docs of near-maximal size for that token).
    """
    from .pip_knn import _cache_scoped

    t = int(threshold_pct)
    # the shingle explode is consumed by the df aggregate, the rank join
    # and both exact-overlap token sides; the ranked window feeds the
    # prefix self-join (twice) and the size aggregate — persist both so
    # the tokenization + global-order window run once (measured r6).
    sh = _cache_scoped(
        "prefix_join_sh",
        word_shingles(df, text_col, id_col, w=3).select(
            F.col(id_col).alias("doc"), "shingle"
        ),
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ordered = sh.join(freq, "shingle")
    wd = Window.partitionBy("doc").orderBy("df", "shingle")
    ranked = _cache_scoped(
        "prefix_join_ranked",
        ordered.select(
            "doc", "shingle",
            F.row_number().over(wd).cast("long").alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("doc"))
            .cast("long").alias("sz"),
        ),
    )
    # prefix length |d| - ceil(t|d|/100) + 1 = |d| - (t|d| + 99) div 100 + 1
    pref = ranked.filter(
        F.col("rk")
        <= F.col("sz") - F.expr(f"({t} * sz + 99) div 100") + F.lit(1)
    )
    cand = (
        pref.select(F.col("doc").alias("id_a"), "shingle")
        .join(pref.select(F.col("doc").alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sizes = ranked.groupBy("doc").agg(F.max("sz").alias("sz"))
    a_tok = sh.select(F.col("doc").alias("id_a"), "shingle")
    b_tok = sh.select(F.col("doc").alias("id_b"), "shingle")
    shared = (
        cand.join(a_tok, "id_a")
        .join(b_tok, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        shared.join(
            sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("szb")),
            "id_b",
        )
        .select(
            "id_a", "id_b", "inter",
            (F.col("sza") + F.col("szb") - F.col("inter")).alias("uni"),
            # per-side sizes make the ASYMMETRIC containment ratios
            # inter/sza ("a quoted inside b") consumer-derivable exactly
            "sza", "szb",
        )
        .filter(F.lit(100) * F.col("inter") >= F.lit(t) * F.col("uni"))
    )
    return out
