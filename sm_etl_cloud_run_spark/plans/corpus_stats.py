"""Corpus-statistics queries: repetition filtering, TF-IDF, unigram-LM
scoring, temperature resampling.

Training-data curation operators beyond the basic text layer
(plans/textops.py) — the filters a large-scale pretraining pipeline
runs between ingestion and packing:

- **repetition filter** (Gopher-style): per-document duplicate-word and
  top-bigram fractions with a keep/drop verdict. Repetitious documents
  (boilerplate, keyword stuffing, scraper loops) are the single biggest
  quality lever on web corpora.
- **TF-IDF top terms**: the distinctive terms of each document via an
  inverted-index join (term → document frequency) — the building block
  for topic tagging and per-domain mixture analysis.
- **unigram log-prob score** (CCNet-style): score each document by the
  average corpus-unigram log-probability of its tokens; gibberish and
  rare-token spam score low, fluent text scores high.
- **temperature resampling**: per-language sqrt-temperature sampling
  targets (the multilingual rebalancing trick) with a deterministic
  md5-threshold row selection — no RNG state, reproducible on any
  engine.

Determinism conventions (see plans/registry.py): every fraction that
feeds a comparison is scaled-integer; log-derived weights are floored
at 1e6 scale so the only doubles crossing the oracle hash are single
IEEE ops on identical inputs; orderings always carry a unique
tiebreaker.

100 TB shapes: everything is explode → hash-aggregate → shuffle join on
term/lang keys — the inverted-index layout. Term keys are zipfian, so
the df join rides AQE skew handling; the df/weight sides are
aggregated (|vocab| / |langs| rows, not |corpus|) before joining back.
No Python touches any row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import exploded_shingles, token_count, tokens
from ..tables import load_tables
from .registry import register

# Gopher-ish thresholds (scaled to this synthetic corpus's vocabulary).
_MAX_DUP_WORD_BP = 6000      # ≤60% repeated words
_MAX_TOP_BIGRAM_BP = 2000    # top bigram ≤20% of all bigrams
_MIN_TOKENS = 5

_TOPK_TERMS = 3
_TEMPERATURE_BUDGET = 200    # target sample size across all languages


# ---------------------------------------------------------------------------
# Gopher-style repetition filter
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
), base AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
  FROM toks
), bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
  FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
), bgc AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
), bga AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count,
         CAST(SUM(c) AS BIGINT) AS n_bigrams
  FROM bgc GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_distinct,
       CAST(FLOOR(10000.0 * (b.n_tokens - b.n_distinct) / b.n_tokens) AS BIGINT) AS dup_word_bp,
       COALESCE(a.top_bigram_count, 0) AS top_bigram_count,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       CAST(CASE WHEN a.n_bigrams IS NULL THEN 0
            ELSE FLOOR(10000.0 * a.top_bigram_count / a.n_bigrams) END AS BIGINT) AS top_bigram_bp,
       CAST(CASE WHEN FLOOR(10000.0 * (b.n_tokens - b.n_distinct) / b.n_tokens) <= {_MAX_DUP_WORD_BP}
                  AND COALESCE(CAST(FLOOR(10000.0 * a.top_bigram_count / a.n_bigrams) AS BIGINT), 0)
                      <= {_MAX_TOP_BIGRAM_BP}
                  AND b.n_tokens >= {_MIN_TOKENS}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM base b LEFT JOIN bga a USING (doc_id)
"""


@register("text_repetition_filter", oracle=_REPETITION_ORACLE,
          description="Gopher-style repetition filter: duplicate-word and "
                      "top-bigram fractions with keep/drop verdict")
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics and a keep verdict.

    Two repetition signals from the Gopher/MassiveText filter family:
    duplicate-word fraction (1 - distinct/total, in basis points) and
    the most frequent bigram's share of all bigrams. Documents failing
    either threshold — or shorter than `_MIN_TOKENS` — are marked drop.

    Plan: one pass computes token counts per doc (codegen, no shuffle);
    the bigram side explodes 2-shingles and hash-aggregates twice
    ((doc, bigram) → doc), both map-side-combined on doc-keyed data, then
    left-joins back on doc_id. At corpus scale all three aggregates
    partition on doc_id/(doc_id, bigram) — uniform keys, no skew, and
    the explode never amplifies past token count.
    """
    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = t["documents"].select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    bigrams = exploded_shingles(t["documents"], 2, alias="bigram")
    bga = (
        bigrams.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("long").alias("top_bigram_count"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
    )
    dup_word_bp = F.floor(
        10000.0 * (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens")
    ).cast("long")
    top_bigram_bp = F.when(F.col("n_bigrams").isNull(), F.lit(0)).otherwise(
        F.floor(10000.0 * F.col("top_bigram_count") / F.col("n_bigrams"))
    ).cast("long")
    keep = (
        (dup_word_bp <= _MAX_DUP_WORD_BP)
        & (F.coalesce(top_bigram_bp, F.lit(0)) <= _MAX_TOP_BIGRAM_BP)
        & (F.col("n_tokens") >= _MIN_TOKENS)
    )
    return (
        base.join(bga, "doc_id", "left")
        .select(
            "doc_id", "n_tokens", "n_distinct",
            dup_word_bp.alias("dup_word_bp"),
            F.coalesce(F.col("top_bigram_count"), F.lit(0)).cast("long").alias("top_bigram_count"),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            top_bigram_bp.alias("top_bigram_bp"),
            F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms (inverted-index join)
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(FLOOR(1000000.0 * ln(CAST(n.n_docs AS DOUBLE) / df.df)) AS BIGINT) AS idf_micro
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tf, df, idf_micro, tf * idf_micro AS tfidf_micro,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tf * idf_micro DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, idf_micro, tfidf_micro, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK_TERMS}
"""


@register("text_tfidf_topterms", oracle=_TFIDF_ORACLE,
          description="TF-IDF distinctive terms per document via "
                      "inverted-index df join + per-doc top-k")
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-`_TOPK_TERMS` terms per document by TF-IDF.

    The inverted-index shape: explode tokens → (doc, term) counts →
    term-level document frequency → join the (aggregated, |vocab|-sized)
    df side back on term → per-doc top-k window. IDF is floored at 1e6
    scale so the ranking key (tf × idf_micro) is a long — exact on both
    engines; ln of identical doubles differs at worst 1 ulp, 10 orders
    below the floor step.

    At 100 TB: term keys are zipfian — the df join is the classic
    skew-join case AQE handles (the df side is one row per term, so
    broadcast kicks in for bounded vocabularies); both aggregates are
    map-side combined; the final window partitions on doc_id (uniform).
    """
    t = load_tables(spark, sf_dir)
    tf = (
        t["documents"]
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # 1-row scalar broadcast (q11/q15-style threshold join) — whitelisted
    # in the plan-hygiene test's nested-loop allowance.
    n = t["documents"].agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "idf_micro",
            F.floor(1000000.0 * F.log(F.col("n_docs").cast("double") / F.col("df"))).cast("long"),
        )
        .withColumn("tfidf_micro", (F.col("tf") * F.col("idf_micro")).cast("long"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_micro").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= _TOPK_TERMS)
        .select("doc_id", "term", "tf", "df", "idf_micro", "tfidf_micro", "rn")
    )


# ---------------------------------------------------------------------------
# unigram-LM log-probability quality score (CCNet-style)
# ---------------------------------------------------------------------------

_UNIGRAM_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
), uni AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY term
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_tokens FROM uni
), logp AS (
  SELECT term, CAST(FLOOR(1000000.0 * ln(CAST(c AS DOUBLE) / t_tokens)) AS BIGINT) AS logp_micro
  FROM uni CROSS JOIN tot
)
SELECT tf.doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf.tf * logp.logp_micro) AS BIGINT) AS sum_logp_micro,
       CAST(SUM(tf.tf * logp.logp_micro) AS DOUBLE)
         / (1000000.0 * SUM(tf.tf)) AS avg_logp
FROM tf JOIN logp USING (term)
GROUP BY tf.doc_id
"""


@register("text_unigram_logprob", oracle=_UNIGRAM_ORACLE,
          description="CCNet-style quality score: per-doc average corpus-unigram "
                      "log-probability (fluent text scores high)")
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score documents by average corpus-unigram log-probability.

    The CCNet filtering idea with the corpus itself as the language
    model: build unigram counts, convert to 1e6-scaled log-probs
    (longs), then per-doc sum tf·logp exactly in integer space — the
    summation is order-free, so Spark's partition order can't perturb
    the hash. The only double in the output is one division at the end.

    Same inverted-index scale shape as TF-IDF: two map-side-combined
    aggregates, one join on the zipfian term key against a |vocab|-sized
    aggregated side, one final doc-keyed aggregate.
    """
    t = load_tables(spark, sf_dir)
    tf = (
        t["documents"]
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    uni = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("c"))
    # 1-row scalar broadcast — whitelisted nested-loop shape, see
    # text_tfidf_topterms.
    tot = uni.agg(F.sum("c").cast("long").alias("t_tokens"))
    logp = uni.crossJoin(F.broadcast(tot)).select(
        "term",
        F.floor(1000000.0 * F.log(F.col("c").cast("double") / F.col("t_tokens"))).cast("long")
        .alias("logp_micro"),
    )
    return (
        tf.join(logp, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("logp_micro")).cast("long").alias("sum_logp_micro"),
        )
        .select(
            "doc_id", "n_tokens", "sum_logp_micro",
            (F.col("sum_logp_micro").cast("double") / (1000000.0 * F.col("n_tokens")))
            .alias("avg_logp"),
        )
    )


# ---------------------------------------------------------------------------
# temperature resampling (multilingual rebalancing)
# ---------------------------------------------------------------------------

_TEMPERATURE_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang
), cum AS (
  SELECT lang, c, SUM(sqrt(CAST(c AS DOUBLE)))
           OVER (ORDER BY lang NULLS LAST ROWS UNBOUNDED PRECEDING) AS cum_w
  FROM counts
), weights AS (
  SELECT lang, c, sqrt(CAST(c AS DOUBLE)) AS w,
         MAX(cum_w) OVER () AS total_w
  FROM cum
), targets AS (
  SELECT lang, c,
         CAST(FLOOR({_TEMPERATURE_BUDGET} * w / total_w) AS BIGINT) AS target_docs
  FROM weights
)
SELECT d.doc_id, d.lang, t.target_docs
FROM documents d JOIN targets t USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) * t.c
      < t.target_docs * 4294967296
"""


@register("training_temperature_sample", oracle=_TEMPERATURE_ORACLE,
          description="temperature (sqrt) resampling across languages: "
                      "deterministic md5-threshold selection toward "
                      "rebalanced per-lang targets")
def training_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sqrt-temperature sampling across languages, RNG-free.

    The multilingual rebalancing trick (sampling share ∝ count^τ with
    τ=0.5): high-resource languages are downweighted, low-resource ones
    kept nearly whole. Per-lang targets come from sqrt weights whose
    normalizer is a CUMULATIVE sum ordered by lang — fixing the
    floating-point summation order so Spark and the oracle add the same
    doubles in the same sequence. Row selection is the uniform
    md5-threshold: keep doc iff hash32(doc_id)·c_lang < target·2³², an
    exact integer comparison, so the sample is reproducible on any
    engine with no RNG state to checkpoint.

    Scale shape: the per-lang weight table is |langs| rows — broadcast
    to the fact side; the only corpus-sized work is one codegen
    filter pass. The window over |langs| rows is driver-trivial.
    """
    t = load_tables(spark, sf_dir)
    counts = t["documents"].groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # NULLS LAST explicitly on BOTH engines: Spark defaults NULLS
    # FIRST, DuckDB NULLS LAST — a hostile NULL-lang row would
    # otherwise reorder the sqrt-weight summation (see
    # mixture._domain_weights for the full story).
    w_cum = Window.orderBy(F.col("lang").asc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = counts.withColumn("cum_w", F.sum(F.sqrt(F.col("c").cast("double"))).over(w_cum))
    weights = cum.select(
        "lang", "c",
        F.sqrt(F.col("c").cast("double")).alias("w"),
        F.max("cum_w").over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("total_w"),
    )
    targets = weights.select(
        "lang", "c",
        F.floor(_TEMPERATURE_BUDGET * F.col("w") / F.col("total_w")).cast("long")
        .alias("target_docs"),
    )
    h32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    return (
        t["documents"]
        .join(F.broadcast(targets), "lang")
        .where(h32 * F.col("c") < F.col("target_docs") * F.lit(4294967296))
        .select("doc_id", "lang", "target_docs")
    )


# ---------------------------------------------------------------------------
# end-to-end curation pipeline: filter → dedup → pack
# ---------------------------------------------------------------------------

_CURATION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, text, string_split(trim(text), ' ') AS w FROM documents
), base AS (
  SELECT doc_id, text,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
  FROM toks
), bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
  FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
), bgc AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
), bga AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM bgc GROUP BY doc_id
), kept AS (
  SELECT b.doc_id, b.text, b.n_tokens
  FROM base b LEFT JOIN bga a USING (doc_id)
  WHERE FLOOR(10000.0 * (b.n_tokens - b.n_distinct) / b.n_tokens) <= {_MAX_DUP_WORD_BP}
    AND COALESCE(CAST(FLOOR(10000.0 * a.top_c / a.n_bg) AS BIGINT), 0) <= {_MAX_TOP_BIGRAM_BP}
    AND b.n_tokens >= {_MIN_TOKENS}
), fp AS (
  SELECT doc_id, n_tokens,
         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
  FROM kept
), uniq AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM fp
  ) WHERE rn = 1
), c AS (
  SELECT doc_id, doc_id % {{n_shards}} AS shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY doc_id % {{n_shards}} ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM uniq
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
       CAST(FLOOR(cum_before / {{budget}}) AS BIGINT) AS seq_id,
       CAST(cum_before % {{budget}} AS BIGINT) AS offset_in_seq
FROM c
""".format(n_shards="{n_shards}", budget="{budget}")

_CURATION_N_SHARDS = 32
_CURATION_BUDGET = 2048


_QUALITY_REPORT_ORACLE = f"""
WITH f AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
  FROM documents
), g AS (
  SELECT *, COUNT(*) OVER (PARTITION BY fp) AS fp_count FROM f
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
       CAST(SUM(CASE WHEN FLOOR(10000.0 * (n_tokens - n_distinct) / n_tokens)
                          <= {_MAX_DUP_WORD_BP}
                      AND n_tokens >= {_MIN_TOKENS} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept_light,
       CAST(SUM(CASE WHEN fp_count > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       CAST(SUM(CAST(FLOOR(10000.0 * n_distinct / n_tokens) AS BIGINT)) AS BIGINT)
         AS ttr_bp_sum,
       CAST(SUM(CAST(FLOOR(10000.0 * n_distinct / n_tokens) AS BIGINT)) AS DOUBLE)
         / COUNT(*) AS avg_ttr_bp
FROM g GROUP BY lang, source
"""


@register("corpus_quality_report", oracle=_QUALITY_REPORT_ORACLE,
          description="per-(lang, source) curation dashboard: doc/token counts, "
                      "repetition keep-rate, exact-dup rate, mean TTR")
def corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The observability aggregate a curation pipeline watches per
    ingest batch: corpus composition (docs, tokens), how much the
    light repetition gate keeps, how much is exactly duplicated, and
    lexical diversity — grouped by (lang, source).

    One fingerprint-keyed window (the dup count) and one
    map-side-combined groupBy; per-doc TTR is floored to basis points
    BEFORE summation so the aggregate is an exact integer on both
    engines (a double mean would be partition-order-dependent).
    """
    from ..functions.text import doc_fingerprint

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    f = t["documents"].select(
        "doc_id", "lang", "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        doc_fingerprint(F.col("text")).alias("fp"),
    )
    g = f.withColumn("fp_count", F.count(F.lit(1)).over(Window.partitionBy("fp")))
    dup_word_bp = F.floor(
        10000.0 * (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens")
    )
    kept = F.when(
        (dup_word_bp <= _MAX_DUP_WORD_BP) & (F.col("n_tokens") >= _MIN_TOKENS), 1
    ).otherwise(0)
    ttr_bp = F.floor(10000.0 * F.col("n_distinct") / F.col("n_tokens")).cast("long")
    return (
        g.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_total"),
            F.sum(kept).cast("long").alias("n_kept_light"),
            F.sum(F.when(F.col("fp_count") > 1, 1).otherwise(0)).cast("long").alias("n_exact_dup"),
            F.sum(ttr_bp).cast("long").alias("ttr_bp_sum"),
        )
        .select(
            "lang", "source", "n_docs", "n_tokens_total", "n_kept_light",
            "n_exact_dup", "ttr_bp_sum",
            (F.col("ttr_bp_sum").cast("double") / F.col("n_docs")).alias("avg_ttr_bp"),
        )
    )


@register(
    "corpus_curation_pipeline",
    oracle=_CURATION_ORACLE.format(n_shards=_CURATION_N_SHARDS, budget=_CURATION_BUDGET),
    description="end-to-end curation: repetition filter → exact dedup → "
                "sequence packing, one composed plan",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three curation stages composed into ONE logical plan: drop
    repetitious documents (Gopher thresholds), keep one copy per exact
    content fingerprint, pack survivors into fixed-budget training
    sequences.

    Because it is a single DataFrame expression, Catalyst fuses the
    stages — the filter prunes before the dedup shuffle, the dedup
    prunes before the pack shuffle, and nothing materializes between
    stages (on a cluster: three exchanges total on uniformly
    distributed keys — (doc,bigram), fingerprint, shard — each over a
    strictly shrinking row set; this is the batch shape of the full
    ingest→train corpus pass).
    """
    from ..functions.text import doc_fingerprint

    t = load_tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = t["documents"].select(
        "doc_id", "text",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    bga = (
        exploded_shingles(t["documents"], 2, alias="bigram")
        .groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bg"))
    )
    dup_word_bp = F.floor(
        10000.0 * (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens")
    )
    top_bigram_bp = F.coalesce(
        F.floor(10000.0 * F.col("top_c") / F.col("n_bg")).cast("long"), F.lit(0)
    )
    kept = (
        base.join(bga, "doc_id", "left")
        .where(
            (dup_word_bp <= _MAX_DUP_WORD_BP)
            & (top_bigram_bp <= _MAX_TOP_BIGRAM_BP)
            & (F.col("n_tokens") >= _MIN_TOKENS)
        )
        .select("doc_id", "text", "n_tokens")
    )
    w_fp = Window.partitionBy("fingerprint").orderBy("doc_id")
    uniq = (
        kept.withColumn("fingerprint", doc_fingerprint(F.col("text")))
        .withColumn("rn", F.row_number().over(w_fp))
        .where(F.col("rn") == 1)
        .select("doc_id", "n_tokens")
    )
    shard = (F.col("doc_id") % _CURATION_N_SHARDS).alias("shard")
    w_pack = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = uniq.select("doc_id", shard, "n_tokens").withColumn(
        "cum_before", F.sum("n_tokens").over(w_pack) - F.col("n_tokens")
    )
    return packed.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        "n_tokens",
        F.floor(F.col("cum_before") / _CURATION_BUDGET).cast("long").alias("seq_id"),
        (F.col("cum_before") % _CURATION_BUDGET).cast("long").alias("offset_in_seq"),
    )


# ---------------------------------------------------------------------------
# adjacent-bigram PMI collocations
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


_PMI_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
uni AS (
  SELECT t[i] AS w, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) x
  GROUP BY t[i]
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
bi AS (
  SELECT t[i] AS w1, t[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i) x
  GROUP BY t[i], t[i+1]
),
scored AS (
  SELECT bi.w1, bi.w2, bi.c12,
         CAST(FLOOR(1000000.0 * ln(
             (CAST(bi.c12 AS DOUBLE) * tot.n)
             / (CAST(u1.c AS DOUBLE) * u2.c)
         )) AS BIGINT) AS pmi_micro
  FROM bi
  JOIN uni u1 ON u1.w = bi.w1
  JOIN uni u2 ON u2.w = bi.w2, tot
  WHERE bi.c12 >= {_PMI_MIN_COUNT}
)
SELECT w1, w2, c12, pmi_micro,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi_micro DESC, w1 ASC, w2 ASC) AS BIGINT) AS rn
FROM scored
QUALIFY rn <= {_PMI_TOPK}
"""


@register("text_pmi_collocations", oracle=_PMI_ORACLE,
          description="top PMI collocations over ADJACENT bigrams (linear in "
                      "tokens, no pair explosion; 1e6-floored log scores)")
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations — the corpus-statistics
    signal behind phrase mining and tokenizer-merge candidates. Pairs
    are ADJACENT bigrams only, so the pair table is linear in corpus
    tokens (window-co-occurrence PMI is the quadratic trap); PMI =
    ln(c12·N / (c1·c2)) floored at 1e6 (the unigram-logprob
    discipline), thresholded at count ≥ 5, top-50 with full
    tiebreakers. Shape: two token-keyed map-side-combined aggregates,
    two joins against the |vocab|-sized unigram table, one TakeOrdered.
    """
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select("doc_id", tokens(F.col("text")).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n"))
    n_bi = F.greatest(F.size("t") - 1, F.lit(0))
    bi = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, n_bi).alias("w1"),
                    F.slice("t", 2, n_bi).alias("w2"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .where(F.col("c12") >= _PMI_MIN_COUNT)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.join(u1, "w1").join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "c12",
            F.floor(
                1000000.0
                * F.log(
                    (F.col("c12").cast("double") * F.col("n"))
                    / (F.col("c1").cast("double") * F.col("c2"))
                )
            ).cast("long").alias("pmi_micro"),
        )
    )
    top = scored.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(_PMI_TOPK)
    w = Window.orderBy(F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc())
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Zipf's-law fit over the corpus vocabulary
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents
),
uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY term
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rnk FROM uni
),
pts AS (
  SELECT CAST(FLOOR(1000.0 * ln(CAST(rnk AS DOUBLE))) AS BIGINT) AS x,
         CAST(FLOOR(1000.0 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS y
  FROM ranked
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT n AS n_terms,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
       round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / (1000.0 * n), 6) AS zipf_intercept
FROM mom
"""


@register("text_zipf_fit", oracle=_ZIPF_ORACLE,
          description="Zipf's-law OLS fit over the vocabulary (log-rank vs log-freq slope)")
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: the slope of ln(freq) on ln(rank) over
    the whole vocabulary (natural corpora sit near −1; synthetic or
    template-heavy corpora flatten). The events_trend_regression
    pattern: log points are 1e3-floored integers (milli-lns keep every
    cross-moment below 2⁶³ at any vocabulary size), the five OLS
    moments are exact BIGINT sums, and the only doubles are the two
    final divisions — so the single-row answer is bit-identical on
    both engines. One explode + vocabulary-sized aggregate; the rank
    is :func:`distributed_rank` (range-partitioned, per-partition
    offsets — no single-partition sort even when the vocabulary is
    web-scale).
    """
    from sm_etl_cloud_run_spark.operators.windows import distributed_rank

    t = load_tables(spark, sf_dir)
    uni = (
        t["documents"]
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ranked = distributed_rank(
        uni, [F.col("c").desc(), F.col("term").asc()], rank_name="rnk"
    )
    pts = ranked.select(
        F.floor(1000.0 * F.log(F.col("rnk").cast("double"))).cast("long").alias("x"),
        F.floor(1000.0 * F.log(F.col("c").cast("double"))).cast("long").alias("y"),
    )
    mom = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = (n * F.col("sxx") - sx * sx).cast("double")
    slope = num / den
    return mom.select(
        n.alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy.cast("double") - slope * sx.cast("double")) / (1000.0 * n.cast("double")), 6)
        .alias("zipf_intercept"),
    )


# ---------------------------------------------------------------------------
# interpolated bigram-LM quality score (the unigram scorer's stronger twin)
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
),
uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM tok GROUP BY term
),
tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t FROM uni),
docbg AS (
  SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf2
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(string_split(trim(text), ' '))),
             i -> string_split(trim(text), ' ')[i] || ' ' ||
                  string_split(trim(text), ' ')[i + 1])) AS bg
    FROM documents
  )
  GROUP BY doc_id, bg
),
c2 AS (SELECT bg, CAST(SUM(tf2) AS BIGINT) AS c2 FROM docbg GROUP BY bg),
scored AS (
  SELECT c2.bg,
         CAST(FLOOR(1000000.0 * ln(
             0.7 * CAST(c2.c2 AS DOUBLE) / u1.c1
           + 0.3 * CAST(u2.c1 AS DOUBLE) / tot.t)) AS BIGINT) AS logp_micro
  FROM c2
  JOIN uni u1 ON u1.term = string_split(c2.bg, ' ')[1]
  JOIN uni u2 ON u2.term = string_split(c2.bg, ' ')[2]
  CROSS JOIN tot
)
SELECT d.doc_id,
       CAST(SUM(d.tf2) AS BIGINT) AS n_bigrams,
       CAST(SUM(d.tf2 * s.logp_micro) AS BIGINT) AS sum_logp_micro,
       CAST(SUM(d.tf2 * s.logp_micro) AS DOUBLE) / (1000000.0 * SUM(d.tf2)) AS avg_logp
FROM docbg d JOIN scored s USING (bg)
GROUP BY d.doc_id
"""


@register("text_bigram_logprob", oracle=_BIGRAM_ORACLE,
          description="interpolated bigram-LM quality score (0.7·p(w2|w1) + 0.3·p(w2))")
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average interpolated bigram log-probability — the
    CCNet-style fluency score upgraded one Markov order (repetitive or
    scrambled text scores low even when its unigrams look natural).

    Same inverted-index algebra as text_unigram_logprob: bigram/unigram
    count tables are vocabulary-sized aggregates, the interpolated
    probability is computed ONCE per distinct bigram (not per
    occurrence), floored to 1e6-scaled integer log-probs, and the
    per-doc combination is an exact integer dot of (tf₂, logp_micro).
    Docs with fewer than two tokens have no bigrams and drop out on
    both engines (inner-join semantics). Shingles ride the engine's
    slice+zip fast path (word_shingles), not dynamic array indexing.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    uni = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term").agg(F.count("*").cast("long").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").cast("long").alias("t"))
    docbg = (
        exploded_shingles(docs, 2, alias="bg")
        .groupBy("doc_id", "bg").agg(F.count("*").cast("long").alias("tf2"))
    )
    c2 = docbg.groupBy("bg").agg(F.sum("tf2").cast("long").alias("c2"))
    w1 = F.element_at(F.split(F.col("bg"), " "), 1)
    w2 = F.element_at(F.split(F.col("bg"), " "), 2)
    scored = (
        c2.join(uni.withColumnRenamed("term", "__w1").withColumnRenamed("c1", "c1_w1"),
                w1 == F.col("__w1"))
        .join(uni.withColumnRenamed("term", "__w2").withColumnRenamed("c1", "c1_w2"),
              w2 == F.col("__w2"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            F.floor(
                1000000.0
                * F.log(
                    0.7 * F.col("c2").cast("double") / F.col("c1_w1")
                    + 0.3 * F.col("c1_w2").cast("double") / F.col("t")
                )
            ).cast("long").alias("logp_micro"),
        )
    )
    return (
        docbg.join(scored, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("tf2").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf2") * F.col("logp_micro")).cast("long").alias("sum_logp_micro"),
            (
                F.sum(F.col("tf2") * F.col("logp_micro")).cast("double")
                / (1000000.0 * F.sum("tf2"))
            ).alias("avg_logp"),
        )
    )


# ---------------------------------------------------------------------------
# exact global length deciles over documents (distributed_ntile consumer)
# ---------------------------------------------------------------------------

_LEN_DECILES_ORACLE = """
WITH scored AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         CAST(ntile(10) OVER (ORDER BY length(text) DESC, doc_id ASC) AS BIGINT)
           AS decile
  FROM documents
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM scored GROUP BY decile
"""


@register("documents_length_deciles", oracle=_LEN_DECILES_ORACLE,
          description="exact global length deciles over the corpus "
                      "(distributed_ntile: range-partitioned, no single-task sort)")
def documents_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length-distribution bands — the curation diagnostic that
    decides truncation/packing budgets. The decile assignment is the
    EXACT global ntile computed by `operators/windows.distributed_ntile`
    (range partition on (length desc, doc_id), per-partition row_number
    + broadcast offsets, closed-form rank→tile) — a bare ntile window
    would sort the whole corpus in one task. Per-decile stats are then
    a 10-group hash aggregate. Also serves as the operator's second
    oracle-checked consumer (the driver gate exercises the rank→tile
    math against DuckDB's native ntile).
    """
    from sm_etl_cloud_run_spark.operators.windows import distributed_ntile

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    scored = distributed_ntile(
        docs, [F.col("n_chars").desc(), F.col("doc_id").asc()],
        10, tile_name="decile",
    )
    return scored.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# BPE merge candidates: first-round pair statistics for tokenizer training
# ---------------------------------------------------------------------------

_BPE_TOPK = 20

_BPE_ORACLE = f"""
WITH uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents)
  GROUP BY term
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(term)),
                               i -> substring(term, CAST(i AS INT), 2))) AS pair,
         c
  FROM uni WHERE length(term) >= 2
)
SELECT pair, CAST(SUM(c) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT {_BPE_TOPK}
"""


@register("corpus_bpe_merge_candidates", oracle=_BPE_ORACLE,
          description="BPE tokenizer training: top first-round merge pairs "
                      "(adjacent-char pair counts weighted by term frequency)")
def corpus_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistic a BPE tokenizer trainer computes every merge round:
    corpus-weighted adjacent-symbol pair counts, highest first (Sennrich
    et al.'s merge rule; round one shown — later rounds re-run the same
    plan over re-segmented terms).

    Scale shape: pair generation runs over the DISTINCT vocabulary
    weighted by term frequency — |vocab| rows × term length, never
    |corpus| — so the expensive explode is vocabulary-sized (the same
    trick a real trainer uses: count types once, weight by frequency).
    One hash aggregate on the pair key + TakeOrdered(k). Single-char
    terms contribute nothing (guarded: Spark's sequence(1, 0) would
    generate a DESCENDING range, not an empty one).
    """
    t = load_tables(spark, sf_dir)
    uni = (
        t["documents"]
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.length("term") >= 2)
    )
    pairs = uni.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("term") - 1),
                lambda i: F.col("term").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(_BPE_TOPK)
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets: head / middle / tail per language
# ---------------------------------------------------------------------------

# Calibration-sample BOUND (docs per language, in expectation). The
# per-lang Bernoulli rate is min(1, TARGET / N_lang), realized as the
# deterministic integer test  h32(doc_id) * N_lang < TARGET * 2^32
# (h32 = first 8 md5 hex chars) — both engines agree on membership
# exactly, and the sample stays TARGET-sized no matter how large the
# corpus or how skewed its language mix. 128 exercises the cap on the
# dominant language at every test SF (en: 193/218/2059 docs).
_PPL_CAL_TARGET = 128
_PPL_CAL_T32 = _PPL_CAL_TARGET * 4294967296  # precomputed: DuckDB would
# evaluate the bare literal product in INT32 and overflow

_PPL_BUCKETS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, lang, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, lang, term
), uni AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY term
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_tokens FROM uni
), logp AS (
  SELECT term, CAST(FLOOR(1000000.0 * ln(CAST(c AS DOUBLE) / t_tokens)) AS BIGINT) AS logp_micro
  FROM uni CROSS JOIN tot
), doc AS (
  SELECT tf.doc_id, tf.lang,
         CAST((-CAST(SUM(tf.tf * logp.logp_micro) AS BIGINT)) // SUM(tf.tf) AS BIGINT) AS ppl_micro
  FROM tf JOIN logp USING (term)
  GROUP BY tf.doc_id, tf.lang
), ln AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM doc GROUP BY lang
), samp AS (
  SELECT doc.doc_id, doc.lang, doc.ppl_micro FROM doc JOIN ln USING (lang)
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        * n_lang < {_PPL_CAL_T32}
), rk AS (
  SELECT lang, ppl_micro, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ppl_micro ASC, doc_id ASC) AS rn
  FROM samp
), sn AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM rk GROUP BY lang
), thr AS (
  SELECT rk.lang,
         CAST(MIN(CASE WHEN rk.rn = (sn.n + 2) // 3 THEN rk.ppl_micro END) AS BIGINT) AS t1,
         CAST(MIN(CASE WHEN rk.rn = (2 * sn.n + 2) // 3 THEN rk.ppl_micro END) AS BIGINT) AS t2
  FROM rk JOIN sn USING (lang) GROUP BY rk.lang
), assigned AS (
  SELECT doc.lang,
         CASE WHEN thr.t1 IS NULL THEN 'unsampled'
              WHEN doc.ppl_micro <= thr.t1 THEN 'head'
              WHEN doc.ppl_micro <= thr.t2 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM doc LEFT JOIN thr USING (lang)
), counts AS (
  SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM assigned GROUP BY lang, bucket
), lt AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS lang_total FROM counts GROUP BY lang)
SELECT c.lang, c.bucket, c.n_docs,
       CAST(c.n_docs * 10000 // lt.lang_total AS BIGINT) AS share_bp
FROM counts c JOIN lt USING (lang)
"""


@register("corpus_perplexity_buckets", oracle=_PPL_BUCKETS_ORACLE,
          description="CCNet head/middle/tail quality buckets per language: "
                      "tercile thresholds from a deterministic 25% calibration "
                      "sample, map-side assignment for the full corpus")
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet (Wenzek et al.) corpus-quality binning: score every
    document with a language-model perplexity proxy, cut each language
    into head/middle/tail at tercile thresholds, and report the bucket
    census that drives downstream mixing ("train on head+middle").

    The scale design is CCNet's own: tercile thresholds come from a
    BOUNDED calibration sample — per-language Bernoulli rate
    min(1, {_PPL_CAL_TARGET} / N_lang), realized as the deterministic
    integer test h32(doc_id) * N_lang < {_PPL_CAL_TARGET} * 2^32 over
    the md5 hash, after one cheap per-lang count. Both engines agree
    on membership exactly, and the sample holds ~{_PPL_CAL_TARGET}
    docs per language IN EXPECTATION regardless of corpus size or
    language skew (a fixed FRACTION would asymptotically BE the corpus
    — the round-5 scale flag this replaces). Belt and braces, the
    sample rank ALSO rides distributed_rank_in_groups, so even a
    mis-sized sample never sorts in one task. Full-corpus assignment
    is a broadcast join of the per-lang threshold table + a CASE
    comparison: map-side, no shuffle beyond the scoring aggregates.
    The perplexity proxy is the text_unigram_logprob convention
    (1e6-floored unigram logprobs, summed as BIGINT — order-free),
    negated BEFORE the floored division so both engines floor a
    POSITIVE dividend. Languages absent from the sample surface as an
    explicit 'unsampled' bucket rather than silently joining a
    tercile.
    """
    from ..operators.windows import distributed_rank_in_groups

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
            "doc_id", "lang",
            F.expr("(-slp) div nt").cast("long").alias("ppl_micro"),
        )
    )
    lang_n = doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_lang")
    )
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    samp = (
        doc.join(F.broadcast(lang_n), "lang")
        .where(h32 * F.col("n_lang") < F.lit(_PPL_CAL_T32))
        .select("doc_id", "lang", "ppl_micro")
    )
    rk = distributed_rank_in_groups(
        samp, ["lang"],
        [F.col("ppl_micro").asc(), F.col("doc_id").asc()],
        rank_name="rn", total_name="n",
    )
    thr = (
        rk
        .groupBy("lang")
        .agg(
            F.min(F.when(F.col("rn") == F.expr("(n + 2) div 3"), F.col("ppl_micro")))
            .cast("long").alias("t1"),
            F.min(F.when(F.col("rn") == F.expr("(2 * n + 2) div 3"), F.col("ppl_micro")))
            .cast("long").alias("t2"),
        )
    )
    assigned = doc.join(F.broadcast(thr), "lang", "left").select(
        "lang",
        F.when(F.col("t1").isNull(), F.lit("unsampled"))
        .when(F.col("ppl_micro") <= F.col("t1"), F.lit("head"))
        .when(F.col("ppl_micro") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    counts = assigned.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    lt = counts.groupBy("lang").agg(F.sum("n_docs").cast("long").alias("lang_total"))
    return counts.join(lt, "lang").select(
        "lang", "bucket", "n_docs",
        F.expr("n_docs * 10000 div lang_total").cast("long").alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# TextRank keywords: PageRank over the word co-occurrence graph
# ---------------------------------------------------------------------------

_TR_MIN_LEN = 4     # content-word heuristic: tokens shorter than this drop
_TR_MIN_CO = 2      # co-occurrence prune
_TR_TOPK = 20
_TR_SCALE = 1_000_000_000_000

_TEXTRANK_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
bg AS (
  SELECT t[r.i] AS w1, t[r.i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i) r
),
und AS (
  SELECT least(w1, w2) AS id_a, greatest(w1, w2) AS id_b FROM bg
  WHERE length(w1) >= {_TR_MIN_LEN} AND length(w2) >= {_TR_MIN_LEN} AND w1 <> w2
),
pairs AS (
  SELECT id_a, id_b FROM und GROUP BY id_a, id_b HAVING COUNT(*) >= {_TR_MIN_CO}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
base AS (
  SELECT {_TR_SCALE} // n AS pr0, (15 * ({_TR_SCALE} // n)) // 100 AS teleport
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg)
),
c1 AS (SELECT d.id, base.pr0 // d.deg AS c FROM deg d, base),
s1 AS (
  SELECT e.dst AS id, CAST(SUM(c1.c) AS BIGINT) AS s
  FROM edges e JOIN c1 ON c1.id = e.src GROUP BY e.dst
),
p1 AS (
  SELECT d.id, d.deg, base.teleport + (85 * COALESCE(s1.s, 0)) // 100 AS pr
  FROM deg d LEFT JOIN s1 USING (id), base
),
c2 AS (SELECT id, pr // deg AS c FROM p1),
s2 AS (
  SELECT e.dst AS id, CAST(SUM(c2.c) AS BIGINT) AS s
  FROM edges e JOIN c2 ON c2.id = e.src GROUP BY e.dst
),
p2 AS (
  SELECT d.id, d.deg, base.teleport + (85 * COALESCE(s2.s, 0)) // 100 AS pr
  FROM deg d LEFT JOIN s2 USING (id), base
)
SELECT id AS word, deg, CAST(pr AS BIGINT) AS pr_micro
FROM p2
ORDER BY pr_micro DESC, word ASC
LIMIT {_TR_TOPK}
"""


@register("text_keyword_textrank", oracle=_TEXTRANK_ORACLE,
          description="TextRank keyword extraction: integer-exact PageRank "
                      "(2 rounds) over the adjacent-word co-occurrence graph, "
                      "top-20 hub words")
def text_keyword_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004), the unsupervised keyword
    extractor: words are nodes, adjacent co-occurrence makes edges,
    and PageRank centrality — not raw frequency — picks the terms that
    tie the corpus together (a hub connected to many distinct contexts
    outranks a word repeated in one).

    The graph build is two aggregates off one bigram explode (the
    text_bigram_logprob layout): undirected pair counts with a
    codegen'd least/greatest normalization, pruned by the
    co-occurrence threshold BEFORE the rank rounds. The ranking itself
    reuses operators/graph.pagerank_undirected — 1e12-micro-unit
    BIGINT mass, truncating DIV everywhere, so two engines agree
    bit-for-bit after any number of rounds (the knn_graph_pagerank
    contract on a word-keyed graph; term keys are zipfian, which the
    checkpointed edge list + AQE absorb).
    """
    from ..operators.graph import pagerank_undirected

    t = load_tables(spark, sf_dir)
    bg = exploded_shingles(t["documents"], 2, alias="bg").select(
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
    )
    und = bg.where(
        (F.length("w1") >= _TR_MIN_LEN)
        & (F.length("w2") >= _TR_MIN_LEN)
        & (F.col("w1") != F.col("w2"))
    ).select(
        F.least("w1", "w2").alias("id_a"), F.greatest("w1", "w2").alias("id_b")
    )
    pairs = (
        und.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .where(F.col("co") >= _TR_MIN_CO)
        .select("id_a", "id_b")
    )
    pr = pagerank_undirected(pairs, iterations=2)
    return (
        pr.select(F.col("id").alias("word"), "deg", "pr_micro")
        .orderBy(F.col("pr_micro").desc(), F.col("word").asc())
        .limit(_TR_TOPK)
    )


# ---------------------------------------------------------------------------
# tokenizer fertility (bytes / chars per token, per language)
# ---------------------------------------------------------------------------

_FERTILITY_ORACLE = """
WITH f AS (
  SELECT lang,
         CAST(strlen(text) AS BIGINT) AS n_bytes,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((1000 * SUM(n_bytes)) // SUM(n_tokens) AS BIGINT) AS bytes_per_token_milli,
       CAST((1000 * SUM(n_chars)) // SUM(n_tokens) AS BIGINT) AS chars_per_token_milli,
       CAST((1000 * SUM(n_tokens)) // COUNT(*) AS BIGINT) AS tokens_per_doc_milli
FROM f
GROUP BY lang
"""


@register("corpus_bytes_per_token", oracle=_FERTILITY_ORACLE,
          description="per-language tokenizer fertility: bytes/chars per "
                      "token and tokens per doc (token-budget planning)")
def corpus_bytes_per_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility profile per language: how many bytes and
    characters one token costs, and how many tokens one document
    yields. The planning input for token-budgeted corpus mixes (a
    100 GB slice of high-fertility text buys fewer training tokens
    than the same bytes of English) and for sizing per-script
    tokenizer vocabularies; bytes and chars diverge exactly where
    multi-byte scripts live, which is why both ratios are reported.

    Ratios are floored-integer milli (DIV) so both engines agree
    bit-for-bit; token_count >= 1 for every document (the ['']
    empty-split contract, functions/text.py), so no division guard is
    needed. 100 TB shape: one map-side projection (three codegen
    expressions), one |langs|-sized hash aggregate with map-side
    combine — no joins, no windows, output is language-cardinality.
    """
    t = load_tables(spark, sf_dir)
    f = t["documents"].select(
        "lang",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.length("text").cast("long").alias("n_chars"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr("(1000 * SUM(n_bytes)) DIV SUM(n_tokens)").cast("long")
        .alias("bytes_per_token_milli"),
        F.expr("(1000 * SUM(n_chars)) DIV SUM(n_tokens)").cast("long")
        .alias("chars_per_token_milli"),
        F.expr("(1000 * SUM(n_tokens)) DIV COUNT(*)").cast("long")
        .alias("tokens_per_doc_milli"),
    )


# ---------------------------------------------------------------------------
# tokenizer vocabulary coverage / OOV rate per language
# ---------------------------------------------------------------------------

_OOV_VOCAB_SIZE = 2000

_OOV_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(trim(text), ' ')) AS term FROM documents
), ltf AS (
  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY lang, term
), uni AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM ltf GROUP BY term
), vocab AS (
  SELECT term FROM uni ORDER BY c DESC, term ASC LIMIT {_OOV_VOCAB_SIZE}
)
SELECT l.lang,
       CAST(SUM(l.tf) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN l.tf ELSE 0 END) AS BIGINT) AS oov_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_types,
       CAST((10000 * SUM(CASE WHEN v.term IS NULL THEN l.tf ELSE 0 END)) // SUM(l.tf) AS BIGINT) AS oov_bp
FROM ltf l LEFT JOIN vocab v ON v.term = l.term
GROUP BY l.lang
"""


@register("corpus_oov_rate", oracle=_OOV_ORACLE,
          description="per-language OOV rate against the corpus top-V "
                      "vocabulary (tokenizer coverage QA)")
def corpus_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage QA: fix the vocabulary at the corpus's top-V
    terms (the stand-in for a trained tokenizer's word list) and
    measure, per language, the share of token INSTANCES and distinct
    token TYPES that fall outside it. A language whose oov_bp is high
    under a shared vocabulary is the language the tokenizer will
    shatter into bytes — the signal that drives per-script vocab
    allocation, and the twin input (with corpus_bytes_per_token) to
    token-budget planning.

    The vocabulary boundary is deterministic: (freq DESC, term ASC) is
    a total order, so both engines cut the same V terms. Shares are
    floored bp.

    100 TB shape: explode → two map-side-combined hash aggregates; the
    top-V cut is TakeOrdered (V rows to the driver, never a global
    sort); vocab broadcasts back onto the |langs × terms| aggregate —
    the zipfian term join never touches raw token instances.
    """
    t = load_tables(spark, sf_dir)
    ltf = (
        t["documents"]
        .select("lang", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    uni = ltf.groupBy("term").agg(F.sum("tf").cast("long").alias("c"))
    vocab = (
        uni.orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(_OOV_VOCAB_SIZE)
        .select("term", F.lit(1).alias("__in_vocab"))
    )
    j = ltf.join(F.broadcast(vocab), "term", "left")
    return j.groupBy("lang").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), F.col("tf")).otherwise(0))
        .cast("long").alias("oov_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
        .cast("long").alias("oov_types"),
        F.expr(
            "CAST((10000 * SUM(CASE WHEN __in_vocab IS NULL THEN tf ELSE 0 END))"
            " DIV SUM(tf) AS BIGINT)"
        ).alias("oov_bp"),
    )


# ---------------------------------------------------------------------------
# topic-lexicon tagging (domain-classifier stand-in for mixture planning)
# ---------------------------------------------------------------------------

_TOPIC_LEXICONS: dict[str, tuple[str, ...]] = {
    "querying": ("query", "filter", "join", "agg", "group"),
    "storage": ("table", "scan", "part", "column", "row"),
    "streaming": ("stream", "window", "batch", "spark"),
}

_TOPIC_CASES = " ".join(
    f"WHEN w IN ({', '.join(repr(t) for t in terms)}) THEN '{topic}'"
    for topic, terms in _TOPIC_LEXICONS.items()
)

_TOPIC_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS w FROM documents
), tagged AS (
  SELECT doc_id, lang, CASE {_TOPIC_CASES} ELSE NULL END AS topic
  FROM tok
), hits AS (
  SELECT doc_id, lang, topic, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM tagged WHERE topic IS NOT NULL GROUP BY doc_id, lang, topic
), dominant AS (
  SELECT doc_id, lang, topic,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, topic ASC) AS rn
  FROM hits
), labeled AS (
  SELECT d.doc_id, d.lang, coalesce(dom.topic, 'untagged') AS topic
  FROM documents d
  LEFT JOIN (SELECT doc_id, topic FROM dominant WHERE rn = 1) dom
    ON dom.doc_id = d.doc_id
)
SELECT lang, topic,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST((10000 * COUNT(*)) // SUM(COUNT(*)) OVER (PARTITION BY lang) AS BIGINT)
         AS share_of_lang_bp
FROM labeled
GROUP BY lang, topic
"""


@register("corpus_topic_tags", oracle=_TOPIC_ORACLE,
          description="lexicon-based dominant-topic tagging per document, "
                      "per-(lang, topic) composition shares")
def corpus_topic_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The domain-classifier stand-in every mixture pipeline starts
    with before a trained classifier exists: tag each document with its
    dominant topic by lexicon hit counts (ties break lexicographically,
    docs with no hits are 'untagged'), then report per-(lang, topic)
    composition — the input corpus_training_mix-style reweighting needs
    when the mixing axis is topical rather than source-based.

    100 TB shape: explode → one (doc, topic)-keyed map-side-combined
    aggregate; the dominant-topic window partitions by doc_id — groups
    are |lexicons|-bounded (≤3 rows each) by pigeonhole; the report is
    a |langs × topics|-sized aggregate whose share window runs over
    parameter-sized groups.
    """
    t = load_tables(spark, sf_dir)
    topic_case = None
    for topic, terms in _TOPIC_LEXICONS.items():
        cond = F.col("w").isin(*terms)
        topic_case = (
            F.when(cond, F.lit(topic)) if topic_case is None
            else topic_case.when(cond, F.lit(topic))
        )
    tok = t["documents"].select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("w")
    )
    hits = (
        tok.select("doc_id", "lang", topic_case.alias("topic"))
        .where(F.col("topic").isNotNull())
        .groupBy("doc_id", "lang", "topic")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_hits").desc(), F.col("topic").asc()
    )
    dom = hits.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    labeled = (
        t["documents"].select("doc_id", "lang")
        .join(dom.select("doc_id", "topic"), "doc_id", "left")
        .select("lang", F.coalesce(F.col("topic"), F.lit("untagged")).alias("topic"))
    )
    wl = Window.partitionBy("lang")
    return (
        labeled.groupBy("lang", "topic")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn("__lang_total", F.sum("n_docs").over(wl).cast("long"))
        .withColumn(
            "share_of_lang_bp",
            F.expr("CAST((10000 * n_docs) DIV __lang_total AS BIGINT)"),
        )
        .drop("__lang_total")
    )


# ---------------------------------------------------------------------------
# token-distribution Shannon entropy (gibberish / keyword-stuffing signal)
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
), tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(CAST(FLOOR(1000000.0 * ln(SUM(tf))) AS BIGINT)
            - SUM(tf * CAST(FLOOR(1000000.0 * ln(tf)) AS BIGINT)) // SUM(tf)
            AS BIGINT) AS entropy_micro
FROM tf
GROUP BY doc_id
"""


@register("text_token_entropy", oracle=_ENTROPY_ORACLE,
          description="per-document Shannon entropy of the token "
                      "distribution (gibberish / keyword-stuffing signal)")
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    quality signal TTR misses: a doc that repeats one word 100 times
    and a doc cycling 5 words 20 times each have different entropy at
    similar TTR bands, and keyword-stuffed spam sits at the low end.
    H = ln(n) - (1/n)·Σ tf·ln(tf), carried as floored-micro integers
    (each ln is one IEEE op on identical inputs, everything after is
    exact BIGINT — the text_unigram_logprob convention), so both
    engines agree bit-for-bit.

    100 TB shape: explode → one (doc, token)-keyed map-side-combined
    aggregate → one doc-keyed aggregate. No joins, no windows, output
    is doc-cardinality.
    """
    t = load_tables(spark, sf_dir)
    tf = (
        t["documents"]
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        (
            F.floor(1000000.0 * F.log(F.sum("tf").cast("double"))).cast("long")
            - F.expr(
                "SUM(tf * CAST(FLOOR(1000000.0 * ln(CAST(tf AS DOUBLE))) AS BIGINT))"
                " DIV SUM(tf)"
            )
        ).cast("long").alias("entropy_micro"),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM (continuation-count discounting)
# ---------------------------------------------------------------------------

_KN_TOP = 50

_KN_ORACLE = f"""
WITH toks AS (SELECT string_split(trim(text), ' ') AS t FROM documents),
bg AS (
  SELECT t[r.i] AS w1, t[r.i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i) r
),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n1_fw
        FROM c2 GROUP BY w1),
bk AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1_bw FROM c2 GROUP BY w2),
bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_types FROM c2)
SELECT c2.w1, c2.w2 AS w2, c12, c1, n1_fw, n1_bw,
       CAST((1000000 * (4 * c12 - 3)) // (4 * c1)
            + (3 * n1_fw * ((1000000000 * n1_bw) // b_types)) // (4 * c1 * 1000)
         AS BIGINT) AS pkn_micro
FROM c2 JOIN ctx USING (w1) JOIN bk ON bk.w2 = c2.w2 CROSS JOIN bt
ORDER BY c12 DESC, w1 ASC, w2 ASC
LIMIT {_KN_TOP}
"""


@register("text_bigram_kneser_ney", oracle=_KN_ORACLE,
          description="interpolated Kneser-Ney bigram probabilities "
                      "(continuation-count discounting, D=0.75)")
def text_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram estimates (Kneser & Ney 1995;
    Chen & Goodman 1999) — the LM smoothing whose backoff weight is a
    CONTINUATION count (how many distinct contexts a word follows),
    not a raw frequency; the standard strong-baseline scorer for
    perplexity-style data filtering:

        P_KN(w2|w1) = (c(w1,w2) - D)/c(w1)
                    + D * N1+(w1,*)/c(w1) * N1+(*,w2)/B

    with D = 0.75 = 3/4 exactly, so everything stays in integer space:
    term1 = (4*c12 - 3) * 1e6 // (4*c1); the continuation probability
    enters through a nano-scaled ratio (1e9*N1bw // B) so the term-2
    product 3 * N1fw * r_cont_nano stays under 2^63 even at a 1e8-type
    vocabulary (term1's bound: the top bigram count must stay under
    ~2.3e12, comfortably true of any real corpus). Both engines
    evaluate the identical floor chain — exact parity including the
    smoothing tail.

    Output: the {_KN_TOP} most frequent bigrams (count DESC, bigram
    ASC tiebreak) with their raw counts, context counts, forward /
    backward continuation counts, and pkn_micro.

    100 TB shape: one (w1,w2) hash aggregate (map-side combined; the
    exploded bigram stream never materializes), PERSISTED via the
    tracked cache — the type table feeds FOUR branches (itself, the
    context aggregate, the backward continuation aggregate, and the
    1-row B scalar), and without materialization every branch replays
    the corpus explode (measured 213 s -> ~6 s warm at the 16x probe).
    Then two vocabulary-sized aggregates, two vocabulary-keyed joins
    (zipfian heads — AQE skew-join splits them), one 1-row scalar
    broadcast for B (whitelisted), TakeOrdered for the top slice.
    """
    from ..cache import persist_tracked

    t = load_tables(spark, sf_dir)
    bg = exploded_shingles(t["documents"], 2).select(
        F.split(F.col("s"), " ").getItem(0).alias("w1"),
        F.split(F.col("s"), " ").getItem(1).alias("w2"),
    )
    c2 = persist_tracked(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    ctx = c2.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1_fw"),
    )
    bk = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1_bw"))
    bt = c2.agg(F.count(F.lit(1)).cast("long").alias("b_types"))
    scored = (
        c2.join(ctx, "w1")
        .join(bk, "w2")
        .crossJoin(F.broadcast(bt))
        .select(
            "w1", "w2", "c12", "c1", "n1_fw", "n1_bw",
            F.expr(
                "CAST((1000000 * (4 * c12 - 3)) DIV (4 * c1)"
                " + (3 * n1_fw * ((1000000000 * n1_bw) DIV b_types)) DIV (4 * c1 * 1000)"
                " AS BIGINT)"
            ).alias("pkn_micro"),
        )
    )
    return scored.orderBy(
        F.col("c12").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(_KN_TOP)


# ---------------------------------------------------------------------------
# vocabulary coverage curve (tokenizer sizing diagnostic)
# ---------------------------------------------------------------------------

# Ladder points scaled to this synthetic corpus's 31-term vocabulary;
# production uses a power-of-4 ladder up to the candidate vocab sizes
# (16k / 64k / 256k / 1M).
_COVERAGE_KS = (4, 8, 16, 24)

_COVERAGE_ORACLE = f"""
WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY term),
r AS (
  SELECT term, c,
         CAST(ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS BIGINT) AS rnk,
         CAST(SUM(c) OVER (ORDER BY c DESC, term ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS tot,
         CAST(COUNT(*) OVER () AS BIGINT) AS v
  FROM uni
)
SELECT rnk AS vocab_k, term AS boundary_term, c AS boundary_count,
       cum AS tokens_covered,
       CAST((10000 * cum) // tot AS BIGINT) AS coverage_bp,
       v AS vocab_total
FROM r WHERE rnk IN {_COVERAGE_KS} OR rnk = v
"""


@register("corpus_vocab_coverage", oracle=_COVERAGE_ORACLE,
          description="token-coverage curve at candidate vocabulary sizes "
                      "(tokenizer sizing; distributed_rank over the vocab)")
def corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer sizing diagnostic: what fraction of all token
    OCCURRENCES the top-k vocabulary covers, at each candidate k plus
    the full-vocabulary anchor — the curve that picks a vocab size
    before training a tokenizer (the corpus_oov_rate twin, swept over
    k instead of fixed at one V).

    Shape: one map-side-combined term-count aggregate, then the
    vocabulary rank rides :func:`distributed_rank` (range-partitioned,
    no single-task sort even at web-scale vocabularies). The coverage
    numbers do NOT use a second global prefix-sum pass: each ladder
    point is one conditional SUM inside a single aggregate over the
    persisted ranked relation (ladder-width CASE columns, map-side
    combined), unpivoted against the <=|ladder|+1 boundary rows via a
    1-row scalar broadcast (whitelisted). The oracle mirrors with a
    window prefix-sum — same integers, single-task is fine for DuckDB.
    """
    from ..operators.windows import distributed_rank

    t = load_tables(spark, sf_dir)
    uni = (
        t["documents"]
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = distributed_rank(
        uni, [F.col("c").desc(), F.col("term").asc()],
        rank_name="rnk", total_name="v",
    )
    sums = ranked.agg(
        *[
            F.sum(F.when(F.col("rnk") <= k, F.col("c"))).cast("long").alias(f"s{k}")
            for k in _COVERAGE_KS
        ],
        F.sum("c").cast("long").alias("tot"),
    )
    bounds = ranked.where(
        F.col("rnk").isin(*_COVERAGE_KS) | (F.col("rnk") == F.col("v"))
    )
    covered = F.coalesce(
        *[F.when(F.col("rnk") == k, F.col(f"s{k}")) for k in _COVERAGE_KS],
        F.col("tot"),
    ).cast("long")
    return bounds.crossJoin(F.broadcast(sums)).select(
        F.col("rnk").cast("long").alias("vocab_k"),
        F.col("term").alias("boundary_term"),
        F.col("c").alias("boundary_count"),
        covered.alias("tokens_covered"),
        F.expr(
            "CAST((10000 * "
            + "coalesce("
            + ", ".join(f"CASE WHEN rnk = {k} THEN s{k} END" for k in _COVERAGE_KS)
            + ", tot)) DIV tot AS BIGINT)"
        ).alias("coverage_bp"),
        F.col("v").cast("long").alias("vocab_total"),
    )


# ---------------------------------------------------------------------------
# filter-funnel ablation report (curation governance)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = f"""
WITH toks AS (SELECT doc_id, text, string_split(trim(text), ' ') AS w FROM documents),
base AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
  FROM toks
),
bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
  FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
),
bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
bga AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM bgc GROUP BY doc_id),
fl AS (
  SELECT b.doc_id, b.fp,
         CASE WHEN b.n_tokens >= {_MIN_TOKENS} THEN 1 ELSE 0 END AS p1,
         CASE WHEN FLOOR(10000.0 * (b.n_tokens - b.n_distinct) / b.n_tokens)
                   <= {_MAX_DUP_WORD_BP} THEN 1 ELSE 0 END AS p2,
         CASE WHEN COALESCE(CAST(FLOOR(10000.0 * a.top_c / a.n_bg) AS BIGINT), 0)
                   <= {_MAX_TOP_BIGRAM_BP} THEN 1 ELSE 0 END AS p3
  FROM base b LEFT JOIN bga a USING (doc_id)
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(1 - p1) AS BIGINT) AS f1a,
         CAST(SUM(1 - p2) AS BIGINT) AS f2a,
         CAST(SUM(1 - p3) AS BIGINT) AS f3a,
         CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS f4a,
         CAST(SUM(1 - p1) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN p1 = 1 AND p2 = 1 AND p3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         CAST(SUM(p1 * p2 * p3) AS BIGINT) AS pass123,
         CAST(COUNT(DISTINCT CASE WHEN p1 = 1 AND p2 = 1 AND p3 = 1 THEN fp END) AS BIGINT)
           AS surv
  FROM fl
)
SELECT CAST(1 AS BIGINT) AS stage, 'min_tokens' AS rule, f1a AS n_failed_alone,
       s1 AS n_removed_seq, n_total - s1 AS n_survivors FROM agg
UNION ALL SELECT 2, 'dup_words', f2a, s2, n_total - s1 - s2 FROM agg
UNION ALL SELECT 3, 'top_bigram', f3a, s3, n_total - s1 - s2 - s3 FROM agg
UNION ALL SELECT 4, 'exact_dup', f4a, pass123 - surv, surv FROM agg
"""


@register("corpus_filter_funnel", oracle=_FUNNEL_ORACLE,
          description="filter-funnel ablation: per curation rule, docs failing "
                      "it ALONE vs removed at its sequential stage vs survivors")
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation sign-off report: for each filter in the pipeline
    (min length -> repeated-words -> top-bigram dominance -> exact
    dedup), how many documents that rule would remove ALONE, how many
    it actually removes at its position in the sequence (marginal,
    after earlier rules already fired), and how many documents survive
    the funnel so far. The alone-vs-sequential gap is what tells a
    pipeline owner which rules overlap and which carry unique signal —
    the standard ablation table corpus papers publish.

    Shape: per-doc flags come from one projection plus the per-doc
    top-bigram aggregate (doc-keyed, map-side combined); the funnel
    itself needs NO window and NO fingerprint shuffle beyond two
    count-distincts — sequential dedup removal = pass123 minus
    DISTINCT fingerprints among pass123 (first-writer-wins counts,
    not row identities). One fact aggregate -> one 4-row explode.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        F.col("text"),
        tokens(F.col("text")).alias("w"),
    )
    from ..functions.text import doc_fingerprint

    # flag definitions shared with corpus_curation_pipeline (same
    # thresholds, same fingerprint helper) — this report is the
    # ablation OF that funnel, so the two must not drift
    base = docs.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct"),
        doc_fingerprint(F.col("text")).alias("fp"),
    )
    bgc = (
        exploded_shingles(docs, 2, alias="bigram")
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bga = bgc.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bg")
    )
    fl = base.join(bga, "doc_id", "left").select(
        "fp",
        F.when(F.col("n_tokens") >= _MIN_TOKENS, 1).otherwise(0).alias("p1"),
        F.when(
            F.floor(10000.0 * (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens"))
            <= _MAX_DUP_WORD_BP, 1,
        ).otherwise(0).alias("p2"),
        F.when(
            F.coalesce(
                F.floor(10000.0 * F.col("top_c") / F.col("n_bg")).cast("long"), F.lit(0)
            ) <= _MAX_TOP_BIGRAM_BP, 1,
        ).otherwise(0).alias("p3"),
    )
    agg = fl.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(1 - F.col("p1")).cast("long").alias("f1a"),
        F.sum(1 - F.col("p2")).cast("long").alias("f2a"),
        F.sum(1 - F.col("p3")).cast("long").alias("f3a"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).cast("long").alias("f4a"),
        F.sum(1 - F.col("p1")).cast("long").alias("s1"),
        F.sum(F.when((F.col("p1") == 1) & (F.col("p2") == 0), 1).otherwise(0))
        .cast("long").alias("s2"),
        F.sum(F.when((F.col("p1") == 1) & (F.col("p2") == 1) & (F.col("p3") == 0), 1)
              .otherwise(0)).cast("long").alias("s3"),
        F.sum(F.col("p1") * F.col("p2") * F.col("p3")).cast("long").alias("pass123"),
        F.countDistinct(
            F.when((F.col("p1") == 1) & (F.col("p2") == 1) & (F.col("p3") == 1), F.col("fp"))
        ).cast("long").alias("surv"),
    )
    rows = F.array(
        F.struct(
            F.lit(1).cast("long").alias("stage"), F.lit("min_tokens").alias("rule"),
            F.col("f1a").alias("n_failed_alone"), F.col("s1").alias("n_removed_seq"),
            (F.col("n_total") - F.col("s1")).alias("n_survivors"),
        ),
        F.struct(
            F.lit(2).cast("long").alias("stage"), F.lit("dup_words").alias("rule"),
            F.col("f2a").alias("n_failed_alone"), F.col("s2").alias("n_removed_seq"),
            (F.col("n_total") - F.col("s1") - F.col("s2")).alias("n_survivors"),
        ),
        F.struct(
            F.lit(3).cast("long").alias("stage"), F.lit("top_bigram").alias("rule"),
            F.col("f3a").alias("n_failed_alone"), F.col("s3").alias("n_removed_seq"),
            (F.col("n_total") - F.col("s1") - F.col("s2") - F.col("s3")).alias("n_survivors"),
        ),
        F.struct(
            F.lit(4).cast("long").alias("stage"), F.lit("exact_dup").alias("rule"),
            F.col("f4a").alias("n_failed_alone"),
            (F.col("pass123") - F.col("surv")).alias("n_removed_seq"),
            F.col("surv").alias("n_survivors"),
        ),
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# distributed BPE merge step: one pair-count round of tokenizer training
# ---------------------------------------------------------------------------

_BPE_TOPN = 10

_BPE_ORACLE = f"""
WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents),
tf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE len(w) >= 2 GROUP BY w
),
pr AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair, w, tf
  FROM tf, range(1, 64) t(i)
  WHERE i <= len(w) - 1
),
pc AS (
  SELECT pair,
         CAST(SUM(tf) AS BIGINT) AS pair_count,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS n_tokens
  FROM pr GROUP BY pair
),
ex AS (
  SELECT pair, w AS example_token,
         ROW_NUMBER() OVER (PARTITION BY pair ORDER BY tf DESC, w DESC) AS rn
  FROM (SELECT DISTINCT pair, w, tf FROM pr)
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pc.pair_count DESC, pc.pair ASC) AS BIGINT)
         AS merge_rank,
       pc.pair, pc.pair_count, pc.n_tokens,
       ex.example_token,
       replace(ex.example_token, pc.pair, '+') AS merged_example
FROM pc JOIN ex ON ex.pair = pc.pair AND ex.rn = 1
ORDER BY pc.pair_count DESC, pc.pair ASC
LIMIT {_BPE_TOPN}
"""


@register("corpus_bpe_merge_step", oracle=_BPE_ORACLE, bench=True,
          description="one distributed BPE merge round: corpus → adjacent "
                      "char-pair counts → top merge candidates + merged forms")
def corpus_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of byte-pair-encoding tokenizer training (Sennrich et
    al. 2016), distributed: tokenize the corpus, count every adjacent
    symbol pair weighted by token frequency, rank merge candidates, and
    show each candidate applied to its most frequent carrier token
    ('+' standing in for the merged symbol). The missing piece between
    the tokenizer QA family (corpus_bytes_per_token / corpus_oov_rate)
    and an actual trained tokenizer — iterating this step IS BPE
    training, and each round is exactly this plan re-run on the merged
    vocabulary (VERDICT r7 item 5b).

    Exactness: pair counts are integer sums of integer token
    frequencies; example selection is max(struct(tf, token)) — tf
    then lexicographic, mirrored as ORDER BY tf DESC, w DESC in the
    oracle; replace() is left-to-right non-overlapping on both engines
    ('aaa' / 'aa' → '+a').

    Shape at 100 TB: one fact-sized explode → hash agg builds the
    (token, tf) vocabulary (map-side combined); everything after runs
    on VOCAB-sized data — the position explode multiplies by ≤
    max_token_len, pair aggregation lands on an |alphabet|²-bounded
    key space, and the final top-N is a parameter-sized sort. The
    per-pair window in the oracle is an aggregate here (few heavy
    groups rule, operators/windows.py policy).
    """
    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    ).where(F.length("w") >= 2)
    tf = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    pr = tf.select(
        "w", "tf",
        F.explode(
            # positions capped at 63 to mirror the oracle's
            # range(1, 64) exactly — a >=65-char token would otherwise
            # contribute extra pairs on this side only (pinned by the
            # 70-char token in tests/test_encoding_chaos.py
            # hostile_docs_dir).
            F.expr("transform(sequence(1, least(length(w) - 1, 63)),"
                   " i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    pc = pr.groupBy("pair").agg(
        F.sum("tf").cast("long").alias("pair_count"),
        F.countDistinct("w").cast("long").alias("n_tokens"),
        # carrier example: max tf, then max token string — one hash
        # aggregate, not a per-pair window (few heavy groups).
        F.max(F.struct(F.col("tf"), F.col("w"))).alias("__ex"),
    )
    ranked = pc.select(
        "pair", "pair_count", "n_tokens",
        F.col("__ex.w").alias("example_token"),
    ).withColumn(
        "merge_rank",
        F.row_number().over(
            Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        ).cast("long"),
    ).where(F.col("merge_rank") <= _BPE_TOPN)
    # the global window above runs on the |alphabet|²-sized pair table —
    # parameter-sized by construction, not fact-sized.
    return ranked.select(
        "merge_rank", "pair", "pair_count", "n_tokens", "example_token",
        F.expr("replace(example_token, pair, '+')").alias("merged_example"),
    ).orderBy(F.col("pair_count").desc(), F.col("pair").asc())


# ---------------------------------------------------------------------------
# BPE trainer, K merge rounds: the merge step iterated into a tokenizer
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3
# private-use-area sentinel chars: after round r, the merged symbol is
# ONE char, so every later round stays in substring-pair land (each
# char IS a symbol). chr(0xE000+r) never occurs in corpus text; both
# engines treat it as one character (UTF-8, character-based substr).
_BPE_SYM = [chr(0xE000 + r) for r in range(_BPE_ROUNDS)]


def _bpe_pairs_sql(src: str) -> str:
    return f"""
  SELECT substr(w, CAST(i AS INT), 2) AS pair, SUM(tf) AS cnt
  FROM {src}, range(1, 64) t(i)
  WHERE i <= len(w) - 1 AND len(w) >= 2
  GROUP BY pair
"""


def _bpe_top_sql(pairs: str) -> str:
    return f"SELECT pair, cnt FROM {pairs} ORDER BY cnt DESC, pair ASC LIMIT 1"


_BPE_TRAIN_ORACLE = f"""
WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents),
v0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok WHERE len(w) >= 2 GROUP BY w),
p1 AS ({_bpe_pairs_sql('v0')}),
m1 AS ({_bpe_top_sql('p1')}),
v1 AS (SELECT replace(w, (SELECT pair FROM m1), chr(57344)) AS w, tf FROM v0),
p2 AS ({_bpe_pairs_sql('v1')}),
m2 AS ({_bpe_top_sql('p2')}),
v2 AS (SELECT replace(w, (SELECT pair FROM m2), chr(57345)) AS w, tf FROM v1),
p3 AS ({_bpe_pairs_sql('v2')}),
m3 AS ({_bpe_top_sql('p3')})
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS merge_round, pair AS merged, CAST(cnt AS BIGINT) AS pair_count
  FROM m1
  UNION ALL
  SELECT CAST(2 AS BIGINT), replace(pair, chr(57344), (SELECT pair FROM m1)),
         CAST(cnt AS BIGINT) FROM m2
  UNION ALL
  SELECT CAST(3 AS BIGINT),
         replace(replace(pair, chr(57345),
                         replace((SELECT pair FROM m2), chr(57344), (SELECT pair FROM m1))),
                 chr(57344), (SELECT pair FROM m1)),
         CAST(cnt AS BIGINT) FROM m3
)
"""


@register("corpus_bpe_train_rounds", oracle=_BPE_TRAIN_ORACLE,
          description="BPE tokenizer training, 3 merge rounds: iterated "
                      "pair-count -> top merge -> vocabulary rewrite")
def corpus_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_bpe_merge_step iterated into an actual trainer: K=3 merge
    rounds, each counting adjacent symbol pairs over the CURRENT
    vocabulary, electing the top pair (count DESC, pair ASC), and
    rewriting the vocabulary with the merged symbol as one private-use
    char — so round r+1's pair enumeration is the same substring scan
    as round 1's. The emitted merge table spells each merge expanded
    back to base characters (replaying earlier merges), i.e. exactly
    the merges.txt a BPE tokenizer ships.

    Driver loop mechanics: each round collects ONE row (the elected
    pair) — a parameter-sized collect like the seed rows and
    convergence counters elsewhere; everything data-sized stays
    distributed. The corpus is touched ONCE (token-frequency
    aggregate, persisted); all K rounds run over the vocab-sized
    (w, tf) relation — at 100 TB the vocabulary is MBs, so K more
    rounds cost K more vocab scans, not corpus scans.
    """
    from ..cache import persist_tracked

    t = load_tables(spark, sf_dir)
    vocab = persist_tracked(
        t["documents"]
        .select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cur = vocab
    merges: list[tuple[int, str, int]] = []
    for r in range(_BPE_ROUNDS):
        pairs = (
            cur.where(F.length("w") >= 2)
            .select(
                "tf",
                F.explode(
                    # 63-position cap == the oracle's range(1, 64); see
                    # corpus_bpe_merge_step.
                    F.expr("transform(sequence(1, least(length(w) - 1, 63)),"
                           " i -> substring(w, i, 2))")
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("tf").cast("long").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(1).collect()
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        merges.append((r + 1, pair, cnt))
        # F.replace with literal args — never interpolate corpus-derived
        # strings into SQL text (the rehearsal injection-guard rule)
        cur = cur.select(
            F.replace(F.col("w"), F.lit(pair), F.lit(_BPE_SYM[r])).alias("w"), "tf"
        )
    # expand each merge back to base chars by replaying earlier merges
    expanded: dict[str, str] = {}
    rows = []
    for rnd, pair, cnt in merges:
        full = pair
        for sym in reversed(_BPE_SYM[: rnd - 1]):
            full = full.replace(sym, expanded[sym])
        expanded[_BPE_SYM[rnd - 1]] = full
        rows.append((rnd, full, cnt))
    return spark.createDataFrame(
        rows, "merge_round long, merged string, pair_count long"
    )


# ---------------------------------------------------------------------------
# language-balance entropy (mixture concentration diagnostic)
# ---------------------------------------------------------------------------

_LANGBAL_ORACLE = """
WITH g AS (
  SELECT coalesce(lang, '<none>') AS lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
),
m AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(MAX(c) AS BIGINT) AS top_c,
         CAST(CAST(FLOOR(1000000.0 * ln(SUM(c))) AS BIGINT)
              - SUM(c * CAST(FLOOR(1000000.0 * ln(c)) AS BIGINT)) // SUM(c)
              AS BIGINT) AS entropy_micro
  FROM g
)
SELECT n_docs, n_langs, entropy_micro,
       CAST(FLOOR(1000.0 * exp(CAST(entropy_micro AS DOUBLE) / 1000000.0))
            AS BIGINT) AS eff_langs_milli,
       CAST(10000 * top_c // n_docs AS BIGINT) AS top_share_bp
FROM m
"""


@register("corpus_language_balance", oracle=_LANGBAL_ORACLE,
          description="language-balance entropy: Shannon H over the lang "
                      "mixture, effective language count, top-lang share")
def corpus_language_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row concentration diagnostic a mixture planner reads
    before UniMax/temperature reweighting (mixture_unimax_budget,
    domain_mixture_weights): Shannon entropy of the language
    distribution, its exponential — the EFFECTIVE number of languages
    (5 balanced languages → 5.0; one dominant → ~1) — and the head
    language's share. H = ln(n) − (1/n)·Σ c·ln(c) in the
    text_token_entropy floored-micro convention (each ln/exp is one
    IEEE op on identical inputs; everything between is exact BIGINT);
    NULL lang is an explicit '<none>' cohort.

    100 TB shape: one |langs|-sized map-side-combined aggregate, then
    a 1-row reduction. Nothing else.
    """
    t = load_tables(spark, sf_dir)
    g = (
        t["documents"]
        .select(F.coalesce(F.col("lang"), F.lit("<none>")).alias("lang"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = g.agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max("c").cast("long").alias("top_c"),
        (
            F.floor(1000000.0 * F.log(F.sum("c").cast("double"))).cast("long")
            - F.expr(
                "SUM(c * CAST(FLOOR(1000000.0 * ln(CAST(c AS DOUBLE))) AS BIGINT))"
                " DIV SUM(c)"
            )
        ).cast("long").alias("entropy_micro"),
    )
    return m.select(
        "n_docs", "n_langs", "entropy_micro",
        F.floor(
            1000.0 * F.exp(F.col("entropy_micro").cast("double") / 1000000.0)
        ).cast("long").alias("eff_langs_milli"),
        F.expr("CAST(10000 * top_c DIV n_docs AS BIGINT)").alias("top_share_bp"),
    )
