"""Training-data preparation queries: packing, sampling, shuffle buckets.

Scale-layer operators (beyond the reference's surface, like the dedup
and similarity layers): the last mile between a cleaned corpus and a
training run. Each is expression-only (window functions + hash
arithmetic, no Python UDFs) and shuffles once at most, partitioned so
the pattern holds on a 100 TB corpus:

- sequence packing: concat-and-chunk documents into fixed token-budget
  training sequences, parallel across shards (the data-parallel worker
  layout), never a global order-by;
- stratified quota sampling: deterministic per-group top-K in md5
  order — reproducible across runs and engines, no RNG state;
- shuffle bucketing: md5-derived bucket assignment — the deterministic
  "global shuffle" a training pipeline uses to break source ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_tables
from .registry import register

_PACK_BUDGET = 2048
_N_SHARDS = 32
_QUOTA = 40
_N_BUCKETS = 64


_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, doc_id % {_N_SHARDS} AS shard,
         CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM toks
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(cum_before / {_PACK_BUDGET}) AS BIGINT) AS seq_id,
       CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS offset_in_seq
FROM c
"""


@register("training_pack_sequences", oracle=_PACK_ORACLE,
          description="concat-and-chunk sequence packing: per-shard cumulative token "
                      "count → (seq_id, offset) under a fixed token budget")
def training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into training sequences of `_PACK_BUDGET` tokens.

    Concat-and-chunk (the standard LLM pretraining layout): documents are
    laid end-to-end in doc_id order and cut every 2048 tokens; each doc
    learns which sequence it starts in and at what offset. The window is
    PARTITIONED BY a shard key — each shard packs independently, exactly
    like data-parallel training workers — so no global single-partition
    sort exists anywhere in the plan and the shuffle is one hash exchange
    on shard. Token counts are whitespace splits (functions/text.py
    convention), computed inline by codegen.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        (F.col("doc_id") % _N_SHARDS).alias("shard"),
        F.when(F.trim("text") == "", F.lit(0))
        # spelled-out whitespace class == Java \s exactly (bit-identical
        # here), but NOT RE2 \s: RE2 omits vertical tab \x0B, so the
        # oracle uses the same explicit class (ADVICE r11 item 2)
        .otherwise(F.size(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+")))
        .alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = docs.withColumn("cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return packed.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(F.col("cum_before") / _PACK_BUDGET).cast("long").alias("seq_id"),
        (F.col("cum_before") % _PACK_BUDGET).cast("long").alias("offset_in_seq"),
    )


_SAMPLE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_QUOTA}
"""


@register("training_stratified_sample", oracle=_SAMPLE_ORACLE,
          description="deterministic stratified quota sample: per-lang top-K in md5 "
                      "hash order (reproducible, RNG-free)")
def training_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sample, deterministic across runs and engines.

    Ordering by md5(doc_id) is a seedless uniform permutation both Spark
    and DuckDB compute identically — stratified sampling without RNG
    state to checkpoint. One shuffle on lang; row_number stops feeding
    rows past the quota at the sort, so the exchange carries each
    group's top-K candidates only (rank pushdown via the window's
    top-K optimization).
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        t["documents"]
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _QUOTA)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("rn"))
    )


_BUCKET_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % {_N_BUCKETS} AS bucket
  FROM documents
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS min_doc_id
FROM b GROUP BY bucket
"""


@register("training_shuffle_buckets", oracle=_BUCKET_ORACLE,
          description="deterministic global shuffle: md5-derived bucket assignment "
                      "+ per-bucket balance counts")
def training_shuffle_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle bucketing: bucket = md5(doc_id)[0:8] as an
    integer, mod `_N_BUCKETS` — the reproducible analog of a global
    training shuffle (write each bucket as one output partition and the
    corpus's source ordering is broken uniformly). The query returns
    per-bucket counts as the balance check. One map-side-combined hash
    aggregate; no sort, no skew (md5 is uniform by construction).
    """
    t = load_tables(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % _N_BUCKETS
    )
    return (
        t["documents"]
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


_AES_K = 100
_AES_SEED = "aes-seed-1:"


_WEIGHTED_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS wt
  FROM documents
),
u AS (
  SELECT doc_id, wt,
         (CAST(('0x' || substr(md5('{_AES_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) + 1) / 4294967296.0 AS u
  FROM w
),
k AS (
  SELECT doc_id, wt,
         CAST(FLOOR(1000000.0 * ln(u) / wt) AS BIGINT) AS key_micro
  FROM u
)
SELECT doc_id, wt, key_micro,
       CAST(ROW_NUMBER() OVER (ORDER BY key_micro DESC, doc_id ASC) AS BIGINT) AS rn
FROM k
QUALIFY rn <= {_AES_K}
"""


@register("training_weighted_sample", oracle=_WEIGHTED_ORACLE,
          description="Efraimidis-Spirakis weighted sampling without replacement: "
                      "token-count weights, md5 coins, deterministic top-k keys")
def training_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis-Spirakis A-ES scheme (key = u^(1/w), equivalently rank
    by ln(u)/w) with md5-derived uniforms, so every engine and every
    rerun draws the same sample. Weights are token counts — sampling
    documents proportional to their token mass is how a budgeted
    sub-corpus preserves the token-level distribution.

    ln(u)/w is computed once per doc and floored at 1e6 (the
    text_unigram_logprob discipline); selection is a top-k on that
    integer key. Scale shape: one expression-only pass + a TakeOrdered
    top-k — no shuffle except the k-sized result; the classic
    distributed one-pass weighted sampler (A-ES is a single reduce of
    per-partition top-k, exactly what TakeOrdered does).
    """
    from ..functions.text import tokens

    t = load_tables(spark, sf_dir)
    wt = F.size(tokens(F.col("text"))).cast("long")
    h32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(_AES_SEED), F.col("doc_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    u = (h32 + 1) / F.lit(4294967296.0)
    scored = t["documents"].select(
        "doc_id",
        wt.alias("wt"),
        F.floor(1000000.0 * F.log(u) / wt).cast("long").alias("key_micro"),
    )
    # selection via TakeOrdered (per-partition top-k + k-sized reduce);
    # the rank window then orders only the k surviving rows
    top = scored.orderBy(F.col("key_micro").desc(), F.col("doc_id").asc()).limit(_AES_K)
    w = Window.orderBy(F.col("key_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# curriculum schedule: quality-ordered pacing buckets with token budgets
# ---------------------------------------------------------------------------

_CURR_TILES = 10
_CURR_OFF = 1_000_000_000


def _curriculum_oracle() -> str:
    from .textops import QLC_WT_SQL

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
),
w AS (
  SELECT doc_id, {QLC_WT_SQL} AS wt FROM tok
),
sc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(FLOOR(1000.0 * SUM(wt) / COUNT(*)) AS BIGINT) AS y
  FROM w GROUP BY doc_id
),
tiled AS (
  SELECT x, y,
         CAST(NTILE({_CURR_TILES}) OVER (ORDER BY y DESC, doc_id ASC) AS BIGINT)
           AS phase
  FROM sc
),
per AS (
  SELECT phase,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(x) AS BIGINT) AS tokens,
         CAST(SUM(y) AS BIGINT) AS sy
  FROM tiled GROUP BY phase
)
SELECT phase, n_docs, tokens,
       CAST((sy + n_docs * {_CURR_OFF}) // n_docs - {_CURR_OFF} AS BIGINT)
         AS mean_score_milli,
       CAST(SUM(tokens) OVER (ORDER BY phase
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens,
       CAST(10000 * SUM(tokens) OVER (ORDER BY phase
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            // SUM(tokens) OVER () AS BIGINT) AS cum_share_bp
FROM per
"""


@register("training_curriculum_schedule", oracle=_curriculum_oracle(),
          description="curriculum pacing table: quality-score deciles "
                      "best-first with per-phase and cumulative token "
                      "budgets (exact milli/bp)")
def training_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum learning's data-side artifact (Bengio et al. 2009
    applied to corpus curation): order documents by classifier quality
    score, cut the ranking into {n} phases best-first, and report each
    phase's document count, token budget, mean score, and the
    cumulative token position where the phase starts feeding the
    trainer — the table a pacing function is read off of (and the
    token-budget twin of training_token_budget_fill, which answers
    "the best K tokens" for ONE cut; this prices every cut at once).

    Exactness: scores are the quality_linear_classifier floored milli
    integers; the decile is ntile({n}) with the (score DESC, doc_id)
    unique tiebreak, ridden on distributed_ntile (no bare
    doc-cardinality window); phase means use offset-DIV; the
    cumulative walk is a window over the {n}-row phase table.

    Shape at 100 TB: explode → doc-keyed map-side-combined aggregate
    (the classifier pass) → one distributed-ntile rank pass →
    {n}-sized aggregate + {n}-row window.
    """
    from ..functions.text import tokens
    from ..operators.windows import distributed_ntile
    from .textops import QLC_WT_SPARK

    t = load_tables(spark, sf_dir)
    sc = (
        t["documents"]
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .select("doc_id", F.expr(QLC_WT_SPARK).alias("wt"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.floor(1000.0 * F.sum("wt") / F.count(F.lit(1)))
            .cast("long").alias("y"),
        )
    )
    tiled = distributed_ntile(
        sc, [F.col("y").desc(), F.col("doc_id").asc()], _CURR_TILES,
        tile_name="phase",
    )
    per = tiled.groupBy(F.col("phase").cast("long").alias("phase")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("x").cast("long").alias("tokens"),
        F.sum("y").cast("long").alias("sy"),
    )
    w_cum = Window.orderBy("phase").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "phase", "n_docs", "tokens", "sy",
        F.sum("tokens").over(w_cum).cast("long").alias("cum_tokens"),
        F.sum("tokens").over(w_all).cast("long").alias("tot_tokens"),
    ).select(
        "phase", "n_docs", "tokens",
        F.expr(
            f"CAST((sy + n_docs * {_CURR_OFF}) DIV n_docs - {_CURR_OFF}"
            f" AS BIGINT)"
        ).alias("mean_score_milli"),
        "cum_tokens",
        F.expr("CAST(10000 * cum_tokens DIV tot_tokens AS BIGINT)")
        .alias("cum_share_bp"),
    )


# ---------------------------------------------------------------------------
# context-length ladder: truncation loss vs padding waste per candidate L
# ---------------------------------------------------------------------------

_CTX_LADDER = (128, 512, 2048, 8192)


def _ctx_ladder_oracle() -> str:
    arms = []
    for L in _CTX_LADDER:
        arms.append(f"""
  SELECT CAST({L} AS BIGINT) AS context_len,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens,
         CAST(SUM(CASE WHEN n_tokens > {L} THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_truncated,
         CAST(SUM(CASE WHEN n_tokens > {L} THEN n_tokens - {L} ELSE 0 END)
              AS BIGINT) AS tokens_truncated,
         CAST(SUM(CASE WHEN n_tokens > {L} THEN 0 ELSE {L} - n_tokens END)
              AS BIGINT) AS tokens_padded
  FROM toks""")
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END AS n_tokens
  FROM documents
),
arms AS ({" UNION ALL ".join(arms)})
SELECT context_len, n_docs, docs_truncated, tokens_truncated, tokens_padded,
       CAST(10000 * tokens_truncated // corpus_tokens AS BIGINT)
         AS truncated_bp,
       CAST(10000 * (corpus_tokens - tokens_truncated)
            // (n_docs * context_len) AS BIGINT) AS utilization_bp
FROM arms
"""


@register("training_context_length_ladder", oracle=_ctx_ladder_oracle(),
          description="SFT layout decision table: per candidate context "
                      "length, exact truncation loss vs padding waste and "
                      "the resulting utilization")
def training_context_length_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-document-per-sequence (SFT / instruction-tuning) twin of
    training_pack_sequences' concat-and-chunk: when sequences must not
    cross document boundaries, the context length L trades truncation
    (docs longer than L lose their tails — data destroyed) against
    padding (docs shorter than L waste compute), and this table prices
    every rung of the ladder in one scan — tokens_truncated,
    tokens_padded, truncated_bp of the corpus, and utilization
    (kept tokens over n_docs·L, the fraction of the batch the model
    actually trains on). Reading it IS the max_len decision.

    Shape at 100 TB: the ladder lives in conditional-aggregate COLUMNS
    of one doc-keyed pass (the events_watermark_tradeoff pattern —
    adding a rung costs a column, not a scan), exploded to rows only
    at the ladder-sized end. All-integer arithmetic.
    """
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        F.when(F.trim("text") == "", F.lit(0))
        # spelled-out whitespace class == Java \s exactly (bit-identical
        # here), but NOT RE2 \s: RE2 omits vertical tab \x0B, so the
        # oracle uses the same explicit class (ADVICE r11 item 2)
        .otherwise(F.size(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+")))
        .cast("long").alias("n_tokens")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("corpus_tokens"),
    ]
    for L in _CTX_LADDER:
        aggs += [
            F.sum(F.when(F.col("n_tokens") > L, 1).otherwise(0))
            .cast("long").alias(f"__dt_{L}"),
            F.sum(F.when(F.col("n_tokens") > L, F.col("n_tokens") - L)
                  .otherwise(0)).cast("long").alias(f"__tt_{L}"),
            F.sum(F.when(F.col("n_tokens") > L, 0)
                  .otherwise(L - F.col("n_tokens")))
            .cast("long").alias(f"__tp_{L}"),
        ]
    one = toks.agg(*aggs)
    ladder = F.array(*[
        F.struct(
            F.lit(L).cast("long").alias("context_len"),
            F.col(f"__dt_{L}").alias("docs_truncated"),
            F.col(f"__tt_{L}").alias("tokens_truncated"),
            F.col(f"__tp_{L}").alias("tokens_padded"),
        )
        for L in _CTX_LADDER
    ])
    return one.select(
        "n_docs", "corpus_tokens", F.explode(ladder).alias("x")
    ).select(
        F.col("x.context_len").alias("context_len"),
        "n_docs",
        F.col("x.docs_truncated").alias("docs_truncated"),
        F.col("x.tokens_truncated").alias("tokens_truncated"),
        F.col("x.tokens_padded").alias("tokens_padded"),
        F.expr("CAST(10000 * x.tokens_truncated DIV corpus_tokens AS BIGINT)")
        .alias("truncated_bp"),
        F.expr(
            "CAST(10000 * (corpus_tokens - x.tokens_truncated)"
            " DIV (n_docs * x.context_len) AS BIGINT)"
        ).alias("utilization_bp"),
    )
