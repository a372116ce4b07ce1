"""Deduplication operators for large-scale corpus processing.

Not present in the reference (whose dedup is partition-grain
delete-then-insert, SURVEY §2.2 K3/K4); mandated by the engine's
100 TB pipeline scope. Four families:

- **exact**       — hash-groupBy on content (or md5 fingerprint)
- **MinHash+LSH** — shingles → per-seed min-hash signature → banded
                    bucket join → candidate pairs; the scalable
                    near-dup path (no all-pairs comparison)
- **n-gram Jaccard** — exact Jaccard via inverted-index self-join;
                    the ground-truth / small-scale path
- **SimHash**     — bitwise majority fingerprint; hamming-adjacent
                    buckets for near-dup candidates

Determinism: all hashing is ``md5`` so a SQL oracle (DuckDB) can
reproduce signatures byte-for-byte. MinHash "minimum" is the
lexicographic min of hex digests — a valid uniform min-hash that needs
no hex→int conversion on either engine.

Scale notes: signatures are computed array-native per row (no explode,
no shuffle); the only shuffles are the LSH bucket join (keyed on band
hash — short uniform keys) and the inverted-index join (keyed on
shingle; hot shingles handled by AQE skew-join or a frequency cap).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    doc_fingerprint,
    tokens,
    word_shingles,
    word_shingles_from_tokens,
)


def exact_dedup(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """Exact dedup on `subset` (hash aggregate; map-side partial combine)."""
    return df.dropDuplicates(list(subset))


def exact_dedup_by_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per content fingerprint — deterministic winner.

    `min_by` keeps this a single hash aggregate (no window, no sort of
    the full corpus).
    """
    fp = doc_fingerprint(F.col(text_col))
    return (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .withColumnRenamed("__fp", "fingerprint")
    )


def minhash_signatures(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash signature per document: `sig_0 … sig_{n-1}` hex columns.

    Plan: explode shingles once, then ONE hash aggregate with
    `num_hashes` min() columns. Each md5 digest yields FOUR independent
    8-hex-chunk hashes (a 128-bit digest is 4 uniform 32-bit values),
    so `num_hashes` signatures cost only ceil(n/4) salted digests per
    shingle — md5 is the dominant cost at corpus scale. Mins combine
    map-side, so the doc_id shuffle carries ~one row per doc per
    partition. (The array-native alternative — transform + array_min
    per seed — recomputes the shingle array per seed and runs
    interpreted, ~10× slower at bench scale.)

    `hash_fn="xxhash64"` is the production fast path: seeded 64-bit
    integer hashes, fully codegen'd, no digest strings materialized —
    the signature columns become `sig_i: bigint`. md5 stays the default
    because it is the only hash both engines (Spark, DuckDB) compute
    identically, which the correctness oracle requires. Any uniform
    hash family yields a valid MinHash, so both paths find the same
    exact-dups and statistically equivalent near-dups.

    Docs shorter than `shingle_k` words produce no shingles and drop out
    (they can't near-dup match anyway).
    """
    # Materialize the token array in its own projection below the
    # explode (r12, guide §1.3): the shingle generator references the
    # token expression 2k+1 times and Generate gets no
    # common-subexpression elimination, so `split(trim(text))` was
    # evaluated repeatedly per row. Same shingles, ~10% faster.
    exploded = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(word_shingles_from_tokens(F.col("__toks"), shingle_k)).alias("__sh"),
    )
    if hash_fn == "xxhash64":
        return exploded.groupBy(id_col).agg(
            *[
                F.min(F.xxhash64(F.lit(i), F.col("__sh"))).alias(f"sig_{i}")
                for i in range(num_hashes)
            ]
        )
    if hash_fn != "md5":
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    n_digests = (num_hashes + 3) // 4
    digests = {
        d: F.md5(F.concat(F.lit(f"{d}:"), F.col("__sh"))) for d in range(n_digests)
    }
    with_digests = exploded.select(
        id_col, *[digests[d].alias(f"__h{d}") for d in range(n_digests)]
    )
    return with_digests.groupBy(id_col).agg(
        *[
            F.min(F.substring(F.col(f"__h{i // 4}"), 8 * (i % 4) + 1, 8)).alias(f"sig_{i}")
            for i in range(num_hashes)
        ]
    )


def _ensure_persisted(df: DataFrame) -> DataFrame:
    """Persist `df` (tracked) unless the caller already persisted it
    (e.g. the banding tuner passes its own cached signature relation).

    r12: the old comment in `lsh_candidate_pairs` claimed the branches
    share one ReusedExchange — true under sort-merge self-joins, but
    AQE now plans the band join and the signature re-joins as
    BROADCAST joins, whose build sides are separate BroadcastExchanges
    over different projections: the captured plan computed the full
    scan→shingle→md5→aggregate signature pipeline FOUR times.
    """
    sl = df.storageLevel
    if sl.useMemory or sl.useDisk:
        return df
    from ..cache import persist_tracked

    return persist_tracked(df)


def _band_buckets(
    signatures: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, bucket) rows: md5 over each band's signature slice.
    Single definition shared by the pair / group / component paths so
    banding (hash, separator, slicing) can never desynchronize."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "otherwise the trailing signature columns are silently excluded "
            "from every band, weakening LSH recall"
        )
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bucket"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become a candidate pair.

    Plan: explode to (band, bucket_hash) — `bands` rows per doc — then a
    self-equi-join on (band, bucket). Shuffle keys are uniform md5
    buckets, so no skew; this is the join that replaces the O(n²)
    all-pairs comparison at corpus scale.

    Returns distinct (id_a < id_b) pairs with `est_jaccard` = fraction of
    matching signature components.
    """
    # Signatures feed four plan branches (two band sides + two sig
    # re-joins); persist once so the shingle+md5+aggregate pipeline runs
    # once instead of four times (see _ensure_persisted — the former
    # ReusedExchange sharing no longer applies under AQE broadcast
    # planning). At warehouse scale the signature table would be
    # persisted as its own artifact instead.
    signatures = _ensure_persisted(signatures)
    bands_df = _band_buckets(signatures, id_col, num_hashes, bands)

    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = signatures.select(
        F.col(id_col).alias("id_a"), *[F.col(f"sig_{i}").alias(f"a_sig_{i}") for i in range(num_hashes)]
    )
    sb = signatures.select(
        F.col(id_col).alias("id_b"), *[F.col(f"sig_{i}").alias(f"b_sig_{i}") for i in range(num_hashes)]
    )
    pairs = cand.join(sa, "id_a").join(sb, "id_b")
    matches = sum(
        (F.col(f"a_sig_{i}") == F.col(f"b_sig_{i}")).cast("int") for i in range(num_hashes)
    )
    return pairs.select(
        "id_a",
        "id_b",
        (matches.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
    )


def lsh_dedup_groups(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """LSH dedup by CLUSTER ASSIGNMENT — the path that survives massive
    duplicate clusters.

    `lsh_candidate_pairs` enumerates O(c²) pairs per c-clone cluster
    (measured: 64 clones of a 5k-doc corpus → 10M pairs, 330 s). This
    variant assigns each doc the minimum doc-id among everything sharing
    any of its band buckets — linear in docs × bands, independent of
    cluster sizes. One min-propagation round groups exact/high-sim
    duplicates; iterate for full transitive components.

    Returns (id, group_rep); rows with id == group_rep are the keepers.
    """
    # bands_df feeds two branches (the bucket-rep aggregate and the
    # join-back); persist so the signature pipeline runs once (r12 —
    # see _ensure_persisted).
    bands_df = _ensure_persisted(
        _band_buckets(signatures, id_col, num_hashes, bands)
    )
    reps = bands_df.groupBy("band", "bucket").agg(F.min(id_col).alias("bucket_rep"))
    return (
        bands_df.join(reps, ["band", "bucket"])
        .groupBy(id_col)
        .agg(F.min("bucket_rep").alias("group_rep"))
    )


def lsh_dedup_components(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """Full transitive near-dup components over the LSH bucket graph.

    `lsh_dedup_groups` runs ONE min-propagation round: A~B and B~C land
    in the same group only if a shared bucket links them directly. This
    variant iterates doc→bucket→doc min-label propagation to a fixpoint
    (Pregel-style; converges in O(component diameter) rounds, each round
    two keyed shuffles), so chains of near-dups collapse into one
    component — the semantics corpus-level "keep one representative"
    dedup actually needs.

    The driver-side loop is the standard shape for iterative graph
    algorithms on DataFrames: per round `localCheckpoint(eager=True)`
    truncates lineage (no exponential plan growth) and one tiny `agg`
    action reads the convergence counter. Returns (id, group_rep).
    """
    edges = (
        _band_buckets(signatures, id_col, num_hashes, bands)
        .select(
            id_col,
            F.concat_ws("#", F.col("band").cast("string"), F.col("bucket")).alias("__bucket"),
        )
        .localCheckpoint(eager=True)  # scanned twice per round
    )
    labels = edges.select(id_col).distinct().withColumn("__label", F.col(id_col))
    for _ in range(max_iter):
        bucket_min = (
            edges.join(labels, id_col)
            .groupBy("__bucket")
            .agg(F.min("__label").alias("__bmin"))
        )
        prop = (
            edges.join(bucket_min, "__bucket")
            .groupBy(id_col)
            .agg(F.min("__bmin").alias("__new"))
        )
        nxt = (
            labels.join(prop, id_col, "left")
            .select(
                F.col(id_col),
                F.least(F.col("__label"), F.coalesce("__new", "__label")).alias("__label"),
                (F.coalesce("__new", "__label") < F.col("__label")).cast("int").alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.agg(F.sum("__chg")).collect()[0][0]
        labels = nxt.drop("__chg")
        if not changed:
            break
    else:
        raise RuntimeError(
            f"lsh_dedup_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels.withColumnRenamed("__label", "group_rep")


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity via inverted-index self-join.

    |A∩B| from the shingle-keyed join, |A|/|B| from per-doc distinct
    counts; emits pairs with jaccard ≥ threshold.

    `max_df` is the corpus-scale guard: a shingle appearing in df docs
    contributes df² rows to the self-join, so boilerplate shingles
    (headers, licenses) dominate cost while carrying no dedup signal.
    With `max_df` set, shingles above that document frequency are
    dropped BEFORE the join — both intersections and sizes are then
    computed over the capped shingle universe, so the score stays a
    well-defined Jaccard (of the informative shingles) rather than a
    biased estimate of the raw one.
    """
    shingled = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles_from_tokens(F.col("__toks"), shingle_k))
        ).alias("sh"),
    )
    if max_df is not None:
        kept = (
            shingled.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("sh")
        )
        shingled = shingled.join(kept, "sh")
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    return out


def ngram_containment_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection: shingle CONTAINMENT, not Jaccard.

    C(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)| — the
    fraction of A that appears in B. A 50-token quote embedded in a
    5000-token page has C(quote in page) ≈ 1 while its Jaccard is
    ≈ 1% — so symmetric dedup (`ngram_jaccard_pairs`, MinHash-LSH,
    which estimates Jaccard) structurally misses subset duplication:
    quoted posts, article+comments rescrapes, boilerplate-wrapped
    copies. Emits pairs where max(C(a in b), C(b in a)) ≥ threshold,
    with both directions and the Jaccard alongside so the caller can
    separate "same doc" (both high) from "contained" (one high).

    Same inverted-index self-join shape and df-cap scale guard as
    `ngram_jaccard_pairs` (a shingle in df docs costs df² join rows;
    with `max_df`, containment is exact over the informative-shingle
    universe). At 100 TB: explode → hash-agg cap → bucket self-join →
    pair hash-agg, all map-side-combined; no windows, no Python.
    """
    shingled = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles_from_tokens(F.col("__toks"), shingle_k))
        ).alias("sh"),
    )
    if max_df is not None:
        kept = (
            shingled.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("sh")
        )
        shingled = shingled.join(kept, "sh")
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.col("n_common").cast("long").alias("n_common"),
            (F.col("n_common").cast("double") / F.col("sz_a").cast("double")).alias("cont_a"),
            (F.col("n_common").cast("double") / F.col("sz_b").cast("double")).alias("cont_b"),
            (
                F.col("n_common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.greatest(F.col("cont_a"), F.col("cont_b")) >= threshold)
    )


def simhash(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over token hashes.

    Token hash = first 8 md5 hex chars → 32-bit int (via `conv`); bit b of
    the fingerprint is 1 iff more token hashes have bit b set than not.
    Array-native: tokens → transform to ints → per-bit filtered counts.
    """
    toks = F.split(F.trim(F.col(text_col)), " ")
    hashes = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    n = F.size(toks)
    bit_exprs = []
    for b in range(num_bits):
        ones = F.size(F.filter(hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1))
        bit_exprs.append(F.when(ones * 2 > n, F.lit(1).cast("long") * (2**b)).otherwise(F.lit(0).cast("long")))
    fingerprint = sum(bit_exprs[1:], bit_exprs[0])
    return df.select(F.col(id_col), fingerprint.alias("simhash"))


def winnowing_fingerprints(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    hash every k-gram in document order, slide a window of `window`
    consecutive hashes, keep each window's minimum, emit the distinct
    minima per document.

    Guarantees at least one shared fingerprint for any match of length
    ≥ window + k - 1 tokens while storing ~2/(window+1) of the hashes —
    the partial-copy detector whole-document fingerprints can't be.

    Plan (r12, guide §2.4 — remove shuffles outright): winnowing is a
    strictly PER-DOCUMENT computation, so it runs entirely on the
    row's arrays — hash the shingle array once (`__hs`, materialized as
    its own projection so the per-window lambdas reference a cheap
    attribute instead of re-hashing), take each full window's
    `array_min`, `array_distinct` the minima (per-doc distinct == the
    old global DISTINCT, since doc_id is in the key), and explode. The
    former shape exploded every shingle, shuffled the corpus on doc_id
    for a window-min pass, then shuffled AGAIN for the distinct: two
    exchanges and a sort, all for per-row work. Zero exchanges now.
    Tail windows shorter than `window` are excluded (standard
    winnowing uses full windows only): the sequence is guarded to
    empty when n < window — `sequence(0, n-window)` would otherwise
    DESCEND for negative spans.
    """
    hashed = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.transform(
            word_shingles_from_tokens(F.col("__toks"), shingle_k),
            lambda s: F.substring(F.md5(s), 1, 8),
        ).alias("__hs"),
    )
    n = F.size("__hs")
    idx = F.when(n >= window, F.sequence(F.lit(0), n - window)).otherwise(
        F.array().cast("array<int>")
    )
    # r13 (guide §1.2 step 2 — per-task work): least(element_at...)
    # instead of array_min(slice(...)): the slice allocated a
    # window-sized array per position before scanning it; least over
    # direct element loads skips the allocation (~15% on the isolated
    # A/B, rows bit-identical). Expression size is linear in `window`
    # — fine for winnowing's small windows; hashes are never NULL so
    # least == array_min here.
    wmins = F.transform(
        idx,
        lambda i: F.least(
            *[F.element_at(F.col("__hs"), i + F.lit(j + 1)) for j in range(window)]
        ),
    )
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(wmins)).alias("fingerprint")
    )


def plan_lsh_bands(
    threshold: float,
    num_hashes: int,
    *,
    resolution: int = 1000,
) -> tuple[int, int]:
    """Choose (bands, rows_per_band) for a target Jaccard threshold.

    Standard MinHash-LSH planning (Mining of Massive Datasets §3.4):
    the probability a pair of similarity s collides in ≥1 band is
    p(s) = 1 − (1 − s^r)^b with b·r = num_hashes. Pick the divisor
    pair minimizing total error ∫₀^t p(s) ds + ∫ₜ¹ (1 − p(s)) ds —
    false positives below the threshold plus false negatives above —
    by trapezoidal sum at `resolution` points (the same objective
    Spark MLlib's MinHashLSH docs describe; computed exactly enough
    that the argmin is stable).

    Returns (bands, rows_per_band) with bands·rows == num_hashes.
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    best: tuple[float, int, int] | None = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        fp = fn = 0.0
        step = 1.0 / resolution
        for i in range(resolution):
            s = (i + 0.5) * step
            p = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p * step
            else:
                fn += (1.0 - p) * step
        err = fp + fn
        if best is None or err < best[0]:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]


def remove_boilerplate_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 3,
    min_line_chars: int = 10,
    out_col: str = "clean_text",
) -> DataFrame:
    """Corpus-level boilerplate removal (the jusText/CCNet line-dedup
    idea): a LINE that repeats verbatim across ≥ `min_df` documents is
    chrome (nav bars, cookie banners, footers), not content — delete
    every occurrence and reassemble the document.

    Shape: explode lines with position → md5-line hash aggregate for
    document frequency (vocabulary-of-lines sized, heavy hitters only
    after the df filter → broadcastable) → anti-join occurrences
    against the boilerplate set → order-explicit reassembly via
    sort_array(collect_list(struct(pos, line))). Short lines are
    exempt (min_line_chars) so common short utterances survive.
    One doc-keyed shuffle for reassembly. A document whose every line
    is boilerplate still surfaces — as an empty clean_text, not a
    dropped row (left join from the distinct doc ids).
    """
    lines = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    boiler = (
        lines.where(F.length("line") >= min_line_chars)
        .groupBy("line")
        .agg(F.count_distinct(id_col).alias("df"))
        .where(F.col("df") >= min_df)
        .select("line")
    )
    kept = lines.join(F.broadcast(boiler), "line", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias(out_col)
    )
    return (
        docs.select(id_col).distinct()
        .join(reassembled, id_col, "left")
        .select(id_col, F.coalesce(F.col(out_col), F.lit("")).alias(out_col))
    )
