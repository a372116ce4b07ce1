"""Corpus mixture + incremental-ingest curation queries.

Second tranche of training-data curation operators (first tranche:
plans/corpus_stats.py). Covers four more pieces a pretraining data
pipeline runs continuously:

- **cross-corpus duplicate n-gram fraction** (Lee et al.,
  "Deduplicating Training Data Makes Language Models Better"): for each
  document, the fraction of its k-gram occurrences that appear more
  than once in the WHOLE corpus — the scalable n-gram-count
  approximation of duplicated-substring coverage (the exact method is a
  suffix array, which doesn't distribute; the inverted n-gram index
  does).
- **C4-style heuristic gate**: word-count / mean-word-length /
  longest-word / alphabetic-ratio / banned-word rules — the cheap
  expression-only filters C4 applies before any model-based scoring.
- **domain mixture weights**: per-(lang, source) sampling weights that
  reshape the natural corpus composition toward a sqrt-temperature
  target, with the repetition factor capped at 4 epochs (the
  data-constrained scaling rule of thumb) — the table a sampler joins
  against when materializing a training mix.
- **incremental ingest dedup**: the anti-join of a new batch against
  the historical fingerprint index plus within-batch first-writer-wins
  — the shape every continuously-ingesting corpus runs per batch.

Determinism: same conventions as the rest of the registry (scaled
integers for every compared fraction, md5 for hashing, tiebreakers on
every window; see plans/registry.py).

100 TB shapes, per query, in the docstrings below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    doc_fingerprint,
    tokens,
    word_shingles_from_tokens,
)
from ..tables import load_tables
from .registry import register

_DUP_NGRAM_K = 4
_MAX_DUP_NGRAM_BP = 5000     # keep docs with ≤50% corpus-duplicated 4-grams

_C4_MIN_TOKENS = 20
_C4_MEAN_LEN_CENTI_LO = 300   # mean token length in [3.00, 6.00] chars
_C4_MEAN_LEN_CENTI_HI = 600
_C4_MAX_TOKEN_LEN = 15
_C4_BANNED = ("lorem", "ipsum", "slow")

_MIXTURE_EPOCH_CAP_MICRO = 4_000_000   # repeat each domain ≤4 epochs

_INGEST_MOD = 5   # doc_id % 5 == 0 → "new batch"; everything else → history


# ---------------------------------------------------------------------------
# cross-corpus duplicate n-gram fraction (Lee et al. approximation)
# ---------------------------------------------------------------------------

def _kgram_expr(k: int) -> str:
    return " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(k))


_DUP_NGRAM_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - {_DUP_NGRAM_K - 1}, 0) + 1),
                               i -> {_kgram_expr(_DUP_NGRAM_K)})) AS s
  FROM toks
), cnt AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM sh GROUP BY s
), perdoc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_ngrams,
         CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_ngrams
  FROM sh JOIN cnt USING (s) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_ngrams, 0) AS n_ngrams,
       COALESCE(p.n_dup_ngrams, 0) AS n_dup_ngrams,
       CAST(COALESCE(FLOOR(10000.0 * p.n_dup_ngrams / p.n_ngrams), 0) AS BIGINT)
         AS dup_ngram_bp,
       CAST(CASE WHEN COALESCE(FLOOR(10000.0 * p.n_dup_ngrams / p.n_ngrams), 0)
                      <= {_MAX_DUP_NGRAM_BP}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""


@register("text_dup_ngram_fraction", oracle=_DUP_NGRAM_ORACLE, bench=True,
          description="cross-corpus duplicate 4-gram fraction per document "
                      "(Lee-et-al dedup signal via inverted n-gram index)")
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each document's 4-gram occurrences duplicated
    corpus-wide, with a keep verdict at ≤50%.

    The distributable approximation of Lee et al.'s duplicated-span
    metric: a suffix array finds exact duplicated substrings but needs
    global order; counting k-gram occurrences needs only one hash
    aggregate on the k-gram key and one join back — both uniform-key
    shuffles (md5-distributed text makes the grams near-unique keys).

    Plan at 100 TB (r12 rewrite, guide §2.3/§2.4): a gram with corpus
    count 1 occurs in exactly ONE document, so per-doc duplicated
    occurrences = n_ngrams − (#corpus-singleton grams owned by the
    doc), and n_ngrams itself is closed-form from the token count
    (`greatest(size(toks) − (k−1), 0)`). That means ONE explode, one
    map-side-combined gram aggregate carrying `min(doc_id)` (the owner
    is well-defined only for singletons, which are the only rows
    used), one tiny doc-keyed aggregate over the singleton slice, and
    a broadcast re-attach — the exploded relation is never joined and
    never shuffled a second time (the old shape exploded the corpus
    TWICE and hash-joined vocab→exploded rows before a doc-keyed
    shuffle of every occurrence).
    """
    t = load_tables(spark, sf_dir)
    sh = t["documents"].select(
        "doc_id", tokens(F.col("text")).alias("__toks")
    ).select(
        "doc_id",
        F.explode(word_shingles_from_tokens(F.col("__toks"), _DUP_NGRAM_K)).alias("s"),
    )
    gc = sh.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.min("doc_id").alias("__d"),
    )
    singles = (
        gc.where(F.col("c") == 1)
        .groupBy(F.col("__d").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_single"))
    )
    base = t["documents"].select(
        "doc_id",
        F.greatest(
            F.size(tokens(F.col("text"))) - (_DUP_NGRAM_K - 1), F.lit(0)
        ).cast("long").alias("n_ngrams"),
    )
    # `base` carries EVERY doc_id, so it doubles as the left-join spine
    # the old shape re-scanned `documents` a third time for. Zero-gram
    # docs get n_ngrams = 0 → dup_bp's 0/0 division is NULL → coalesce
    # 0 → keep = 1, exactly the old left-join-miss values.
    dup_bp = F.coalesce(
        F.floor(10000.0 * F.col("n_dup_ngrams") / F.col("n_ngrams")), F.lit(0)
    ).cast("long")
    return (
        base.join(singles, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            (F.col("n_ngrams") - F.coalesce(F.col("n_single"), F.lit(0)))
            .cast("long").alias("n_dup_ngrams"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_dup_ngrams",
            dup_bp.alias("dup_ngram_bp"),
            F.when(dup_bp <= _MAX_DUP_NGRAM_BP, 1).otherwise(0).cast("long").alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# C4-style heuristic gate
# ---------------------------------------------------------------------------

_C4_BANNED_SQL = ", ".join(f"'{w}'" for w in _C4_BANNED)

_C4_ORACLE = f"""
WITH f AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(FLOOR(100.0 * (n_chars - n_spaces) / len(w)) AS BIGINT) AS mean_len_centi,
         CAST(COALESCE(list_aggregate(list_transform(w, x -> length(x)), 'max'), 0) AS BIGINT)
           AS max_token_len,
         CAST(len(list_filter(w, x -> regexp_full_match(x, '[a-z]+'))) AS BIGINT)
           AS n_alpha_tokens,
         CAST(len(list_filter(w, x -> x IN ({_C4_BANNED_SQL}))) AS BIGINT) AS n_banned
  FROM f
)
SELECT doc_id, n_tokens, mean_len_centi, max_token_len, n_alpha_tokens, n_banned,
       CAST(CASE WHEN n_tokens >= {_C4_MIN_TOKENS}
                  AND mean_len_centi BETWEEN {_C4_MEAN_LEN_CENTI_LO} AND {_C4_MEAN_LEN_CENTI_HI}
                  AND max_token_len <= {_C4_MAX_TOKEN_LEN}
                  AND n_alpha_tokens * 10 >= n_tokens * 9
                  AND n_banned = 0
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m
"""


@register("text_c4_heuristics", oracle=_C4_ORACLE,
          description="C4-style heuristic gate: word count, mean/max word length, "
                      "alphabetic ratio, banned words → keep verdict")
def text_c4_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cheap-filter family as one codegen pass: ≥20 words, mean
    word length in [3, 6] chars, no word over 15 chars, ≥90% purely
    alphabetic words, zero banned words.

    Every metric is an array expression over one tokenization — no
    shuffle at all; the whole query is a projection the scanner
    pipelines (the 100 TB cost is exactly one pass over the text
    bytes). Integer thresholds (centi-chars, the 9/10 alpha-ratio
    cross-multiplication) keep the verdict exact on both engines.
    """
    t = load_tables(spark, sf_dir)
    w = tokens(F.col("text"))
    n_chars = F.length("text").cast("long")
    n_spaces = (F.length("text") - F.length(F.regexp_replace("text", " ", ""))).cast("long")
    n_tokens = F.size(w).cast("long")
    mean_len_centi = F.floor(100.0 * (n_chars - n_spaces) / n_tokens).cast("long")
    max_token_len = F.coalesce(
        F.array_max(F.transform(w, lambda x: F.length(x))), F.lit(0)
    ).cast("long")
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("^[a-z]+$"))).cast("long")
    banned = F.array(*[F.lit(b) for b in _C4_BANNED])
    n_banned = F.size(F.filter(w, lambda x: F.array_contains(banned, x))).cast("long")
    keep = (
        (n_tokens >= _C4_MIN_TOKENS)
        & mean_len_centi.between(_C4_MEAN_LEN_CENTI_LO, _C4_MEAN_LEN_CENTI_HI)
        & (max_token_len <= _C4_MAX_TOKEN_LEN)
        & (n_alpha * 10 >= n_tokens * 9)
        & (n_banned == 0)
    )
    return t["documents"].select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_len_centi.alias("mean_len_centi"),
        max_token_len.alias("max_token_len"),
        n_alpha.alias("n_alpha_tokens"),
        n_banned.alias("n_banned"),
        F.when(keep, 1).otherwise(0).cast("long").alias("keep"),
    )


# ---------------------------------------------------------------------------
# domain mixture weights (sqrt-temperature target, 4-epoch cap)
# ---------------------------------------------------------------------------

_WEIGHTS_CTE = """g AS (
  SELECT lang, source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
), cum AS (
  SELECT *, SUM(sqrt(CAST(n_tokens AS DOUBLE)))
              OVER (ORDER BY lang NULLS LAST, source NULLS LAST
                    ROWS UNBOUNDED PRECEDING) AS cum_w,
            SUM(n_tokens) OVER () AS total_tokens
  FROM g
), w AS (
  SELECT lang, source, n_docs, n_tokens,
         CAST(total_tokens AS BIGINT) AS total_tokens,
         sqrt(CAST(n_tokens AS DOUBLE)) AS wt,
         MAX(cum_w) OVER () AS total_w
  FROM cum
)"""


def _domain_weights(docs: DataFrame) -> DataFrame:
    """Shared sqrt-temperature weight table (the Spark twin of
    `_WEIGHTS_CTE`): per (lang, source) domain, token counts plus the
    sqrt weight and its cum-sum-ordered normalizer. The cum-sum fixes
    the double-summation order so both engines add sqrt weights in the
    same sequence; ordering is NULLS LAST explicitly on BOTH engines —
    Spark's default is NULLS FIRST while DuckDB's is NULLS LAST, so a
    hostile NULL-lang/source row would otherwise reorder the additions
    and shift every floor() downstream by an ulp."""
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("n_tokens"),
    )
    w_cum = Window.orderBy(
        F.col("lang").asc_nulls_last(), F.col("source").asc_nulls_last()
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = g.withColumn("cum_w", F.sum(F.sqrt(F.col("n_tokens").cast("double"))).over(w_cum)) \
           .withColumn("total_tokens", F.sum("n_tokens").over(w_all).cast("long"))
    return cum.select(
        "lang", "source", "n_docs", "n_tokens", "total_tokens",
        F.sqrt(F.col("n_tokens").cast("double")).alias("wt"),
        F.max("cum_w").over(w_all).alias("total_w"),
    )


def _epochs_micro() -> "F.Column":
    """Capped resampling weight over a `_domain_weights` row."""
    return F.least(
        F.floor(1000000.0 * F.col("wt") * F.col("total_tokens")
                / (F.col("total_w") * F.col("n_tokens"))),
        F.lit(_MIXTURE_EPOCH_CAP_MICRO),
    ).cast("long")


_MIXTURE_ORACLE = f"""
WITH {_WEIGHTS_CTE}
SELECT lang, source, n_docs, n_tokens,
       CAST(FLOOR(10000.0 * n_tokens / total_tokens) AS BIGINT) AS actual_share_bp,
       CAST(FLOOR(10000.0 * wt / total_w) AS BIGINT) AS target_share_bp,
       CAST(FLOOR(1000000.0 * wt * total_tokens / (total_w * n_tokens)) AS BIGINT)
         AS weight_micro,
       CAST(LEAST(FLOOR(1000000.0 * wt * total_tokens / (total_w * n_tokens)),
                  {_MIXTURE_EPOCH_CAP_MICRO}) AS BIGINT) AS epochs_micro
FROM w
"""


@register("domain_mixture_weights", oracle=_MIXTURE_ORACLE,
          description="per-(lang, source) sampling weights toward a sqrt-temperature "
                      "mixture, repetition capped at 4 epochs")
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture table a training sampler joins against: per domain,
    its natural token share, its sqrt-temperature target share, the
    resampling weight (target/actual), and the weight after the 4-epoch
    repetition cap (repeating any domain more than ~4× hurts more than
    it helps — the data-constrained scaling rule).

    Shape: one map-side-combined corpus aggregate down to |domains|
    rows; every window after that runs over the tiny aggregate (see
    `_domain_weights` for the summation-order and NULL-ordering
    contract). A consumer broadcasts this table.
    """
    t = load_tables(spark, sf_dir)
    w = _domain_weights(t["documents"])
    weight_micro = F.floor(
        1000000.0 * F.col("wt") * F.col("total_tokens") / (F.col("total_w") * F.col("n_tokens"))
    ).cast("long")
    return w.select(
        "lang", "source", "n_docs", "n_tokens",
        F.floor(10000.0 * F.col("n_tokens") / F.col("total_tokens")).cast("long")
        .alias("actual_share_bp"),
        F.floor(10000.0 * F.col("wt") / F.col("total_w")).cast("long").alias("target_share_bp"),
        weight_micro.alias("weight_micro"),
        _epochs_micro().alias("epochs_micro"),
    )


# ---------------------------------------------------------------------------
# training-mix materialization (the consumer of the mixture weights)
# ---------------------------------------------------------------------------

_MIX_ORACLE = f"""
WITH {_WEIGHTS_CTE}, t AS (
  SELECT lang, source,
         CAST(LEAST(FLOOR(1000000.0 * wt * total_tokens / (total_w * n_tokens)),
                    {_MIXTURE_EPOCH_CAP_MICRO}) AS BIGINT) AS epochs_micro
  FROM w
), d AS (
  SELECT doc_id, d.lang, d.source,
         CAST(t.epochs_micro // 1000000
              + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                          * 1000000 < (t.epochs_micro % 1000000) * 4294967296
                     THEN 1 ELSE 0 END AS BIGINT) AS n_copies
  FROM documents d JOIN t USING (lang, source)
)
SELECT doc_id, lang, source, n_copies, CAST(ci AS BIGINT) AS copy_idx
FROM d, LATERAL (SELECT unnest(range(1, n_copies + 1)) AS ci) u
WHERE n_copies >= 1
"""


@register("corpus_training_mix", oracle=_MIX_ORACLE, bench=True,
          description="materialize the training mix: per-domain epoch factor → "
                      "deterministic per-doc repetition (explode) / md5 down-sample")
def corpus_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn mixture weights into an actual training mix: every document
    appears floor(epochs) times, plus one more with probability
    frac(epochs) decided by the md5-threshold coin — so a domain with
    epochs=2.3 contributes each doc 2 or 3 times, deterministically
    and identically on any engine. Domains weighted down below 1 epoch
    become a plain md5 down-sample.

    Shape: the |domains|-row epoch table (shared `_domain_weights`
    pipeline) broadcasts onto the corpus; copies come from
    explode(sequence(1, n_copies)) — row amplification bounded by the
    4-epoch cap, no shuffle anywhere (the output inherits the scan's
    partitioning; a downstream pack/shuffle stage is where the copies
    get separated across workers).
    """
    t = load_tables(spark, sf_dir)
    epochs = _domain_weights(t["documents"]).select(
        "lang", "source", _epochs_micro().alias("epochs_micro")
    )
    h32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    n_copies = (
        F.floor(F.col("epochs_micro") / 1000000)
        + F.when(h32 * 1000000 < (F.col("epochs_micro") % 1000000) * F.lit(4294967296), 1)
        .otherwise(0)
    ).cast("long")
    d = (
        t["documents"]
        .join(F.broadcast(epochs), ["lang", "source"])
        .select("doc_id", "lang", "source", n_copies.alias("n_copies"))
        .where(F.col("n_copies") >= 1)
    )
    return d.select(
        "doc_id", "lang", "source", "n_copies",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias("copy_idx"),
    )


# ---------------------------------------------------------------------------
# incremental ingest dedup (new batch vs historical fingerprint index)
# ---------------------------------------------------------------------------

_INGEST_ORACLE = f"""
WITH fp AS (
  SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
  FROM documents
), hist AS (
  SELECT DISTINCT fingerprint FROM fp WHERE doc_id % {_INGEST_MOD} <> 0
), batch AS (
  SELECT doc_id, fingerprint FROM fp WHERE doc_id % {_INGEST_MOD} = 0
), novel AS (
  SELECT b.doc_id, b.fingerprint,
         ROW_NUMBER() OVER (PARTITION BY b.fingerprint ORDER BY b.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY b.fingerprint) AS n_batch_copies
  FROM batch b ANTI JOIN hist h USING (fingerprint)
)
SELECT doc_id, fingerprint, CAST(n_batch_copies AS BIGINT) AS n_batch_copies
FROM novel WHERE rn = 1
"""


@register("dedup_incremental_new_docs", oracle=_INGEST_ORACLE,
          description="incremental ingest dedup: anti-join new batch against the "
                      "historical fingerprint index + within-batch first-writer-wins")
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch dedup for a continuously ingesting corpus: a new batch
    (here doc_id % 5 == 0 stands in for "today's crawl") keeps only
    documents whose content fingerprint is absent from the historical
    index AND wins first-writer within the batch.

    Plan: the anti-join shuffles both sides on the md5 fingerprint —
    uniform keys by construction, so no skew; the within-batch window
    partitions on the same key and Catalyst reuses the exchange (one
    shuffle total for the batch side). At 100 TB the history side is a
    fingerprint-only index (32 bytes/doc, column-pruned off the real
    corpus); Spark's runtime bloom-filter join
    (spark.sql.optimizer.runtime.bloomFilter.enabled) prunes most batch
    rows before the exchange when history ≫ batch.
    """
    t = load_tables(spark, sf_dir)
    fp = t["documents"].select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))
    hist = fp.where(F.col("doc_id") % _INGEST_MOD != 0).select("fingerprint").distinct()
    batch = fp.where(F.col("doc_id") % _INGEST_MOD == 0)
    novel = batch.join(hist, "fingerprint", "left_anti")
    w = Window.partitionBy("fingerprint")
    return (
        novel
        .withColumn("rn", F.row_number().over(w.orderBy("doc_id")))
        .withColumn("n_batch_copies", F.count(F.lit(1)).over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "fingerprint", F.col("n_batch_copies").cast("long"))
    )


# ---------------------------------------------------------------------------
# overlapping chunk windows (RAG / long-document splitting)
# ---------------------------------------------------------------------------

_CHUNK_K = 32   # chunk size (tokens)
_CHUNK_S = 24   # stride (tokens) → 8-token overlap

_CHUNK_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
st AS (
  SELECT doc_id, w, unnest(range(1, len(w) + 1, {_CHUNK_S})) AS start
  FROM toks
)
SELECT doc_id,
       CAST((start - 1) // {_CHUNK_S} AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start_token,
       CAST(len(list_slice(w, start, start + {_CHUNK_K} - 1)) AS BIGINT) AS chunk_len,
       array_to_string(list_slice(w, start, start + {_CHUNK_K} - 1), ' ') AS chunk_text,
       md5(array_to_string(list_slice(w, start, start + {_CHUNK_K} - 1), ' ')) AS chunk_fp
FROM st
"""


@register("text_chunk_windows", oracle=_CHUNK_ORACLE,
          description="overlapping token-window chunking (32-token chunks, "
                      "24-token stride) with per-chunk fingerprints")
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    RAG-indexing / long-document-splitting materialization: each doc
    yields ceil(n/stride) chunks of up to 32 tokens with 8-token
    overlap, plus an md5 fingerprint per chunk (the key a chunk-level
    dedup or embedding index would use downstream).

    Shape: pure explode over a sequence of window starts — row
    amplification n/stride, zero shuffle; the scanner pipelines the
    whole query. Chunk indices derive arithmetically from the start
    offset ((start-1)/stride), so no positional explode state is
    needed and both engines compute identical integers.
    """
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    d = t["documents"].select(
        "doc_id", toks.alias("w"),
        F.explode(F.sequence(F.lit(1), F.size(toks), F.lit(_CHUNK_S))).alias("start"),
    )
    chunk = F.slice(F.col("w"), F.col("start"), F.lit(_CHUNK_K))
    chunk_text = F.array_join(chunk, " ")
    return d.select(
        "doc_id",
        F.floor((F.col("start") - 1) / _CHUNK_S).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start_token"),
        F.size(chunk).cast("long").alias("chunk_len"),
        chunk_text.alias("chunk_text"),
        F.md5(chunk_text).alias("chunk_fp"),
    )


# ---------------------------------------------------------------------------
# duplicated-span REMOVAL (the rewrite step of Lee et al. dedup)
# ---------------------------------------------------------------------------

_SPAN_K = 8   # a token is removed if any corpus-duplicated 8-gram covers it


_REMOVE_SPANS_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, t[i] AS tok, i AS p
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) x
),
grams AS (
  SELECT doc_id, i AS p, {_kgram_expr(_SPAN_K)} AS g
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - {_SPAN_K - 1}, 0) + 1)) AS i) x
),
cnt AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g),
starts AS (
  SELECT doc_id, p, CAST(CASE WHEN c > 1 THEN 1 ELSE 0 END AS INT) AS dup
  FROM grams JOIN cnt USING (g)
),
flags AS (
  SELECT pos.doc_id, pos.p, pos.tok, COALESCE(s.dup, 0) AS dup_start
  FROM pos LEFT JOIN starts s ON s.doc_id = pos.doc_id AND s.p = pos.p
),
cov AS (
  SELECT doc_id, p, tok,
         MAX(dup_start) OVER (PARTITION BY doc_id ORDER BY p
                              ROWS BETWEEN {_SPAN_K - 1} PRECEDING AND CURRENT ROW)
           AS covered
  FROM flags
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(covered) AS BIGINT) AS n_removed,
       md5(COALESCE(string_agg(CASE WHEN covered = 0 THEN tok END, ' ' ORDER BY p), ''))
         AS cleaned_md5
FROM cov GROUP BY doc_id
"""


@register("text_remove_dup_spans", oracle=_REMOVE_SPANS_ORACLE,
          description="Lee-et-al span REMOVAL: rewrite each doc with tokens "
                      "covered by corpus-duplicated 8-grams deleted (cleaned "
                      "text md5 + removal counts)")
def text_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite step `text_dup_ngram_fraction` stops short of:
    actually DELETE duplicated spans from every document. A token is
    covered iff some corpus-wide duplicated 8-gram starts within the
    previous 7 positions; covered tokens are dropped and the surviving
    tokens re-joined (the driver compares the md5 of the rewritten
    text — full strings would bloat the hash compare).

    Shape: one gram-keyed count + join-back (the dup_ngram inverted
    index), one doc-keyed 8-row sliding window for coverage, one
    doc-keyed aggregate whose ordered re-join uses
    sort_array(collect_list(struct(pos, tok))) — order is explicit in
    the data, not the partition layout, so the rewrite is
    deterministic. At 100 TB this is exactly Lee et al.'s ExactSubstr
    dedup quantized to k-gram granularity: every stage is a uniform
    hash shuffle; no suffix array, no global order.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    pos = toks.select("doc_id", F.posexplode("t").alias("p", "tok"))
    grams = toks.select(
        "doc_id",
        F.posexplode(word_shingles_from_tokens(F.col("t"), _SPAN_K)).alias("p", "g"),
    )
    cnt = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    starts = grams.join(cnt, "g").select(
        "doc_id", "p", (F.col("c") > 1).cast("int").alias("dup"),
    )
    flags = pos.join(starts, ["doc_id", "p"], "left").select(
        "doc_id", "p", "tok", F.coalesce(F.col("dup"), F.lit(0)).alias("dup_start"),
    )
    w = (
        Window.partitionBy("doc_id").orderBy("p")
        .rowsBetween(-(_SPAN_K - 1), Window.currentRow)
    )
    cov = flags.withColumn("covered", F.max("dup_start").over(w))
    kept = F.when(F.col("covered") == 0, F.struct("p", "tok"))
    return cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("covered").cast("long").alias("n_removed"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(F.sort_array(F.collect_list(kept)), lambda s: s["tok"]),
            )
        ).alias("cleaned_md5"),
    )


# ---------------------------------------------------------------------------
# token-budget fill: greedy quality-ranked corpus selection to a budget
# ---------------------------------------------------------------------------

_BUDGET_PCT = 25   # select best docs until 25% of corpus tokens are spent

_BUDGET_FILL_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, lang, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, lang, term
), uni AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY term
), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_tokens FROM uni),
logp AS (
  SELECT term, CAST(FLOOR(1000000.0 * ln(CAST(c AS DOUBLE) / t_tokens)) AS BIGINT) AS logp_micro
  FROM uni CROSS JOIN tot
), doc AS (
  SELECT tf.doc_id, tf.lang,
         CAST(SUM(tf.tf) AS BIGINT) AS nt,
         CAST((-CAST(SUM(tf.tf * logp.logp_micro) AS BIGINT)) // SUM(tf.tf) AS BIGINT) AS ppl_micro
  FROM tf JOIN logp USING (term)
  GROUP BY tf.doc_id, tf.lang
), cum AS (
  SELECT doc_id, lang, nt, ppl_micro,
         SUM(nt) OVER (ORDER BY ppl_micro ASC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         (SELECT CAST(SUM(nt) AS BIGINT) FROM doc) AS total_tokens
  FROM doc
), kept AS (
  SELECT * FROM cum WHERE cs <= total_tokens * {_BUDGET_PCT} // 100
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS tokens_kept,
       CAST(MAX(ppl_micro) AS BIGINT) AS cutoff_ppl_micro
FROM kept GROUP BY lang
"""


@register("training_token_budget_fill", oracle=_BUDGET_FILL_ORACLE,
          description="greedy token-budget fill: best-quality documents "
                      "(unigram-LM perplexity order) until 25% of corpus "
                      "tokens are selected; per-lang census + cutoff")
def training_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Give me the best N tokens" — the selection job that turns a
    scored corpus into a fixed-size training set: walk documents from
    most to least fluent (unigram-LM perplexity proxy, the
    corpus_perplexity_buckets score) and keep them until the token
    budget is spent. The cutoff perplexity this discovers per language
    is the number quality-threshold debates are actually about.

    The running token total over the fact-cardinality quality ordering
    is the textbook global-window scale-killer, so it runs on
    :func:`operators.windows.distributed_cumsum` (range partition on
    (ppl, doc_id) → per-partition sums → broadcast exclusive offsets →
    local running sums; grand total rides the offsets — no second
    pass). The budget gate `cs <= total*pct` is then a map-side
    comparison, and the output reduces to a per-lang census. BIGINT
    token counts make the prefix sums order-free and engine-exact.
    """
    from ..operators.windows import distributed_cumsum

    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    uni = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("c"))
    tot = uni.agg(F.sum("c").cast("long").alias("t_tokens"))
    logp = uni.crossJoin(F.broadcast(tot)).select(
        "term",
        F.floor(
            F.lit(1000000.0) * F.log(F.col("c").cast("double") / F.col("t_tokens"))
        ).cast("long").alias("logp_micro"),
    )
    doc = (
        tf.join(logp, "term")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("tf") * F.col("logp_micro")).cast("long").alias("slp"),
            F.sum("tf").cast("long").alias("nt"),
        )
        .select(
            "doc_id", "lang", "nt",
            F.expr("(-slp) div nt").cast("long").alias("ppl_micro"),
        )
    )
    cum = distributed_cumsum(
        doc, [F.col("ppl_micro").asc(), F.col("doc_id").asc()], "nt",
        cumsum_name="cs", total_name="total_tokens",
    )
    kept = cum.where(
        F.col("cs") <= F.expr(f"total_tokens * {_BUDGET_PCT} div 100")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("tokens_kept"),
        F.max("ppl_micro").cast("long").alias("cutoff_ppl_micro"),
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting step (multiplicative weights on excess loss)
# ---------------------------------------------------------------------------

_DOREMI_ETA_BP = 2000  # eta = 0.2 per step

_DOREMI_ORACLE = f"""
WITH tok AS (
  SELECT lang, source, unnest(string_split(trim(text), ' ')) AS term
  FROM documents
), dtf AS (
  SELECT lang, source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY lang, source, term
), uni AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM dtf GROUP BY term
), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_tokens FROM uni),
logp AS (
  SELECT term, CAST(FLOOR(1000000.0 * ln(CAST(c AS DOUBLE) / t_tokens)) AS BIGINT) AS logp_micro
  FROM uni CROSS JOIN tot
),
dom AS (
  SELECT d.lang, d.source,
         CAST(SUM(d.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(d.tf * l.logp_micro) AS BIGINT) AS sum_logp
  FROM dtf d JOIN logp l USING (term)
  GROUP BY d.lang, d.source
),
base AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
         CAST((-SUM(sum_logp)) // SUM(n_tokens) AS BIGINT) AS base_nll
  FROM dom
),
step AS (
  SELECT dom.lang, dom.source, dom.n_tokens,
         (-dom.sum_logp) // dom.n_tokens AS nll_micro,
         (-dom.sum_logp) // dom.n_tokens - base.base_nll AS excess_micro,
         (10000 * dom.n_tokens) // base.t AS w_old_bp,
         GREATEST(
           CASE WHEN (-dom.sum_logp) // dom.n_tokens - base.base_nll >= 0
                THEN 1000000 + ({_DOREMI_ETA_BP} * ((-dom.sum_logp) // dom.n_tokens - base.base_nll)) // 10000
                ELSE 1000000 - ({_DOREMI_ETA_BP} * (base.base_nll - (-dom.sum_logp) // dom.n_tokens)) // 10000
           END, 100000) AS factor_micro
  FROM dom CROSS JOIN base
)
SELECT lang, source, n_tokens,
       CAST(nll_micro AS BIGINT) AS nll_micro,
       CAST(excess_micro AS BIGINT) AS excess_micro,
       CAST(w_old_bp AS BIGINT) AS w_old_bp,
       CAST(factor_micro AS BIGINT) AS factor_micro,
       CAST((10000 * w_old_bp * factor_micro)
            // SUM(w_old_bp * factor_micro) OVER () AS BIGINT) AS w_new_bp
FROM step
"""


@register("mixture_doremi_step", oracle=_DOREMI_ORACLE, bench=True,
          description="DoReMi-style domain reweight: one multiplicative-"
                      "weights step on per-domain excess unigram loss")
def mixture_doremi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One reweighting step of the DoReMi idea (Xie et al. 2023,
    'Doremi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining'): domains whose loss exceeds the corpus baseline get
    upweighted so the next mixture spends more budget where the model
    is worst. The reference proxy model's per-domain loss is stood in
    by the corpus-unigram negative log-likelihood per token (the same
    integer-exact LM machinery as text_unigram_logprob), and the
    exponentiated-gradient update is linearized to stay in integer
    space: factor = 1 + eta * excess (floored micro, clamped at 0.1),
    w_new = normalize(w_old * factor). Iterating IEEE exp() would
    drift between engines — scale design rule 9.

    Output is |domains| rows: token counts, per-domain nll, excess vs
    baseline, the natural-share prior w_old_bp, the update factor, and
    the reweighted w_new_bp (sums to <= 10000 with floored division).

    100 TB shape: the inverted-index unigram pipeline (two map-side-
    combined aggregates, one zipfian term join — AQE skew-join is the
    guard there), then everything runs on the |domains|-sized
    aggregate: two 1-row scalar broadcasts (whitelisted) and one
    window OVER () on parameter-sized rows.
    """
    from ..cache import persist_tracked

    t = load_tables(spark, sf_dir)
    # r12: dtf feeds THREE plan branches (uni → tot/logp and the term
    # join); without a persist the scan→explode→aggregate pipeline ran
    # once per branch (6 scans / 6 Generates in the captured plan).
    # |domains × vocab|-sized — bounded by the vocab, not the corpus.
    dtf = persist_tracked(
        t["documents"]
        .select("lang", "source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    uni = dtf.groupBy("term").agg(F.sum("tf").cast("long").alias("c"))
    tot = uni.agg(F.sum("c").cast("long").alias("t_tokens"))
    logp = uni.crossJoin(F.broadcast(tot)).select(
        "term",
        F.floor(1000000.0 * F.log(F.col("c").cast("double") / F.col("t_tokens")))
        .cast("long").alias("logp_micro"),
    )
    dom = (
        dtf.join(logp, "term")
        .groupBy("lang", "source")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("logp_micro")).cast("long").alias("sum_logp"),
        )
    )
    base = dom.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.expr("(-SUM(sum_logp)) DIV SUM(n_tokens)").cast("long").alias("base_nll"),
    )
    nll = F.expr("(-sum_logp) DIV n_tokens")
    excess = nll - F.col("base_nll")
    factor = F.greatest(
        F.when(
            excess >= 0,
            F.lit(1000000) + F.expr(
                f"({_DOREMI_ETA_BP} * ((-sum_logp) DIV n_tokens - base_nll)) DIV 10000"
            ),
        ).otherwise(
            F.lit(1000000) - F.expr(
                f"({_DOREMI_ETA_BP} * (base_nll - (-sum_logp) DIV n_tokens)) DIV 10000"
            )
        ),
        F.lit(100000),
    ).cast("long")
    step = dom.crossJoin(F.broadcast(base)).select(
        "lang", "source", "n_tokens",
        nll.cast("long").alias("nll_micro"),
        excess.cast("long").alias("excess_micro"),
        F.expr("(10000 * n_tokens) DIV t").cast("long").alias("w_old_bp"),
        factor.alias("factor_micro"),
    )
    # the normalizer runs OVER () on the |domains|-sized relation —
    # parameter-sized by construction, same class as the decile cumsums
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    den = F.sum(F.col("w_old_bp") * F.col("factor_micro")).over(w_all).cast("long")
    return (
        step.withColumn("__den", den)
        .withColumn(
            "w_new_bp",
            F.expr("CAST((10000 * w_old_bp * factor_micro) DIV __den AS BIGINT)"),
        )
        .drop("__den")
    )


# ---------------------------------------------------------------------------
# UniMax per-language budget allocation (epoch-capped waterfilling)
# ---------------------------------------------------------------------------

_UNIMAX_EPOCH_CAP = 4       # no language repeats more than 4 epochs
_UNIMAX_BUDGET_X = 3        # training budget = 3 x the corpus token count

_UNIMAX_ORACLE = f"""
WITH g AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
), c AS (
  SELECT *, n_tokens * {_UNIMAX_EPOCH_CAP} AS capacity,
         {_UNIMAX_BUDGET_X} * SUM(n_tokens) OVER () AS budget,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_langs,
         CAST(ROW_NUMBER() OVER (
              ORDER BY n_tokens * {_UNIMAX_EPOCH_CAP} ASC, lang ASC NULLS LAST)
           AS BIGINT) AS idx,
         COALESCE(SUM(n_tokens * {_UNIMAX_EPOCH_CAP}) OVER (
              ORDER BY n_tokens * {_UNIMAX_EPOCH_CAP} ASC, lang ASC NULLS LAST
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM g
), k AS (
  SELECT *, CASE WHEN capacity * (n_langs - idx + 1) <= budget - cum_prev
                 THEN 1 ELSE 0 END AS capped
  FROM c
), a AS (
  SELECT *, CAST(SUM(capped) OVER () AS BIGINT) AS n_capped,
         COALESCE(SUM(CASE WHEN capped = 1 THEN capacity END) OVER (), 0) AS capped_sum
  FROM k
), b AS (
  SELECT lang, n_docs, n_tokens, capacity, budget, CAST(capped AS BIGINT) AS capped,
         CAST(CASE WHEN capped = 1 THEN capacity
              ELSE (budget - capped_sum) // (n_langs - n_capped)
                   + CASE WHEN idx - n_capped <= (budget - capped_sum) % (n_langs - n_capped)
                          THEN 1 ELSE 0 END
              END AS BIGINT) AS budget_tokens
  FROM a
)
SELECT lang, n_docs, n_tokens, capacity, capped, budget_tokens,
       CAST((1000 * budget_tokens) // n_tokens AS BIGINT) AS epochs_milli,
       CAST((10000 * budget_tokens) // budget AS BIGINT) AS share_bp
FROM b
"""


@register("mixture_unimax_budget", oracle=_UNIMAX_ORACLE,
          description="UniMax language budget allocation: epoch-capped "
                      "waterfilling of the training token budget")
def mixture_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax allocation (Chung et al. 2023, 'UniMax: Fairer and More
    Effective Language Sampling for Large-Scale Multilingual
    Pretraining'): distribute a total training budget across languages
    as uniformly as possible, but never repeat any language more than
    the epoch cap. Sequentially, smallest language first: a language
    takes min(its capacity, remaining budget / remaining languages).

    The sequential loop has a closed form once languages are sorted
    ascending by capacity — the capped set is a PREFIX (if language i
    cannot absorb the equal share, no larger language can either), so
    one window pass decides cap membership: capped(i) iff
    capacity_i * (L - i + 1) <= budget - sum(capacity_{j<i}). Uncapped
    languages then split the leftover exactly: floor share each, one
    extra token to the first (leftover mod U) of them in sort order —
    integer-exact on both engines, no iterative floor drift.

    Output: |langs| rows — corpus tokens, 4-epoch capacity, cap flag,
    the allocated budget_tokens, epochs_milli (how many times that
    language's corpus is traversed), and share_bp of the total budget.

    100 TB shape: ONE map-side-combined corpus aggregate down to
    |langs| rows; every window after that runs over the tiny aggregate
    (the `domain_mixture_weights` pattern). A training sampler
    broadcasts the result.
    """
    t = load_tables(spark, sf_dir)
    g = t["documents"].groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("n_tokens"),
    )
    cap = (F.col("n_tokens") * _UNIMAX_EPOCH_CAP).cast("long")
    w_ord = Window.orderBy(
        F.col("capacity").asc(), F.col("lang").asc_nulls_last()
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = (
        g.withColumn("capacity", cap)
        .withColumn("budget", (F.sum("n_tokens").over(w_all) * _UNIMAX_BUDGET_X).cast("long"))
        .withColumn("n_langs", F.count(F.lit(1)).over(w_all).cast("long"))
        .withColumn("idx", F.row_number().over(w_ord).cast("long"))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("capacity").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    k = c.withColumn(
        "capped",
        F.when(
            F.col("capacity") * (F.col("n_langs") - F.col("idx") + 1)
            <= F.col("budget") - F.col("cum_prev"),
            1,
        ).otherwise(0).cast("long"),
    )
    a = (
        k.withColumn("n_capped", F.sum("capped").over(w_all).cast("long"))
        .withColumn(
            "capped_sum",
            F.coalesce(
                F.sum(F.when(F.col("capped") == 1, F.col("capacity"))).over(w_all),
                F.lit(0),
            ).cast("long"),
        )
    )
    budget_tokens = F.when(F.col("capped") == 1, F.col("capacity")).otherwise(
        F.expr("(budget - capped_sum) DIV (n_langs - n_capped)")
        + F.when(
            F.col("idx") - F.col("n_capped")
            <= F.expr("(budget - capped_sum) % (n_langs - n_capped)"),
            1,
        ).otherwise(0)
    ).cast("long")
    b = a.select(
        "lang", "n_docs", "n_tokens", "capacity", "budget", "capped",
        budget_tokens.alias("budget_tokens"),
    )
    return b.select(
        "lang", "n_docs", "n_tokens", "capacity", "capped", "budget_tokens",
        F.expr("(1000 * budget_tokens) DIV n_tokens").cast("long").alias("epochs_milli"),
        F.expr("(10000 * budget_tokens) DIV budget").cast("long").alias("share_bp"),
    )
