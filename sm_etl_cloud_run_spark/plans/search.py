"""Lexical + hybrid retrieval over `documents`/`embeddings`.

Round-7 additions to the training-data/RAG layer: BM25 keyword ranking
(the lexical-retrieval half the ANN family was missing) and
reciprocal-rank fusion of the lexical and vector lists — the standard
"hybrid search" shape a retrieval pipeline runs at corpus scale.

Determinism: per-term BM25 contributions are floored at 1e6
(micro-units, the text_tfidf_topterms idf pattern) BEFORE the per-doc
SUM, so the total is an exact BIGINT sum on both engines; RRF scores
are 1e12 integer-divided by (60 + rank) — `DIV` on Spark, `//` on
DuckDB, both exact on BIGINT (the knn_graph_pagerank lesson: never
iterate or sum IEEE doubles across engines).

Scale shape: BM25 is two hash aggregates over the exploded token list
(term stats are corpus-wide but tiny — vocabulary-sized — so the df
side broadcasts) plus one broadcast join back onto the per-doc term
frequencies. No all-pairs anything; linear in total tokens. RRF is a
full-outer join of two k-row lists — driver-trivial at any corpus size
because both inputs are already top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.similarity import cosine_similarity
from ..tables import load_tables
from .registry import register
from .vector import _QID_SQL, _dot_sql, _seed_rows

# The BM25 standard constants (Robertson et al.).
_K1 = 1.2
_B = 0.75
_QUERY_TERMS = ("vector", "hash", "merge")
_TOPK = 20
_RRF_K = 60  # the standard RRF dampening constant

_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _QUERY_TERMS) + ")"

# Per-term contribution, floored to micro-units before the per-doc sum:
#   idf = ln((N - df + 0.5) / (df + 0.5) + 1)          [BM25+ idf, >= 0]
#   w   = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# avgdl is expressed as total_tokens/N so the denominator is a pure
# double expression of exact integer inputs on both engines.
_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS dl
  FROM documents
),
corpus AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_tokens
  FROM (SELECT DISTINCT doc_id, dl FROM toks)
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
  FROM toks WHERE term IN {_TERMS_SQL}
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks WHERE term IN {_TERMS_SQL}
  GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         CAST(FLOOR(1000000.0
           * ln((CAST(c.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({_K1} + 1.0))
           / (tf.tf + {_K1} * (1.0 - {_B}
              + {_B} * tf.dl * c.n_docs / CAST(c.total_tokens AS DOUBLE)))
         ) AS BIGINT) AS w_micro
  FROM tf JOIN df USING (term) CROSS JOIN corpus c
)
SELECT doc_id, CAST(SUM(w_micro) AS BIGINT) AS bm25_micro,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
FROM scored
GROUP BY doc_id
ORDER BY bm25_micro DESC, doc_id ASC
LIMIT {_TOPK}
"""


def _bm25_scored(docs: DataFrame) -> DataFrame:
    """Per-doc BM25 micro-score for `_QUERY_TERMS` (all docs, unranked).

    Doc length comes from `size(tokens)` and only QUERY-TERM hits are
    exploded (array-filter first): the full token stream never becomes
    rows. ~25% faster than the explode-everything shape at sf0.1 even
    though the array filter is an interpreted HigherOrderFunction —
    the explode fan-out dominates, and it shrinks with query length,
    not corpus size.

    r12: `base` feeds three branches (corpus stats, tf, df) and is
    persisted so the scan+tokenize+filter pass runs once instead of
    three times. It is already the lightweight proxy (doc_id, dl,
    query-term hits — no token arrays), so the cache is doc-table-sized
    metadata, not the corpus.
    """
    from ..cache import persist_tracked

    base = persist_tracked(
        docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.filter("toks", lambda x: x.isin(*_QUERY_TERMS)).alias("hits"),
        )
    )
    corpus = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    hits = base.where(F.size("hits") > 0).select(
        "doc_id", "dl", F.explode("hits").alias("term")
    )
    tf = hits.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf"), F.max("dl").alias("dl")
    )
    df = hits.groupBy("term").agg(F.count_distinct("doc_id").cast("long").alias("df"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _K1 * (
        1.0 - _B + _B * F.col("dl") * F.col("n_docs") / F.col("total_tokens").cast("double")
    )
    w_micro = F.floor(1000000.0 * idf * (F.col("tf") * (_K1 + 1.0)) / denom).cast("long")
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", w_micro.alias("w_micro"))
        .groupBy("doc_id")
        .agg(
            F.sum("w_micro").cast("long").alias("bm25_micro"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )


@register("text_bm25_topk", oracle=_BM25_ORACLE, bench=True,
          description="BM25 keyword retrieval top-k (lexical search baseline)")
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k for a fixed conjunctive keyword query.

    Plan: explode→two hash aggs (tf per doc-term; df per term) → the
    term-level df side and the 1-row corpus stats broadcast back onto
    tf → per-doc exact integer sum → TakeOrdered. One doc-keyed
    shuffle; term stats are vocabulary-sized. At 100 TB the df/corpus
    aggregates are the only corpus-wide state and they stay tiny.
    """
    t = load_tables(spark, sf_dir)
    return (
        _bm25_scored(t["documents"])
        .orderBy(F.col("bm25_micro").desc(), F.col("doc_id").asc())
        .limit(_TOPK)
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of the BM25 and cosine lists
# ---------------------------------------------------------------------------

_RRF_SCALE = 1_000_000_000_000  # 1e12 integer units per reciprocal rank

_HYBRID_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS dl
  FROM documents
),
corpus AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_tokens
  FROM (SELECT DISTINCT doc_id, dl FROM toks)
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
  FROM toks WHERE term IN {_TERMS_SQL}
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks WHERE term IN {_TERMS_SQL}
  GROUP BY term
),
bm25 AS (
  SELECT doc_id, CAST(SUM(CAST(FLOOR(1000000.0
           * ln((CAST(c.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({_K1} + 1.0))
           / (tf.tf + {_K1} * (1.0 - {_B}
              + {_B} * tf.dl * c.n_docs / CAST(c.total_tokens AS DOUBLE)))
         ) AS BIGINT)) AS BIGINT) AS bm25_micro
  FROM tf JOIN df USING (term) CROSS JOIN corpus c
  GROUP BY doc_id
),
lex AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id ASC) AS BIGINT) AS r
  FROM bm25 ORDER BY bm25_micro DESC, doc_id ASC LIMIT {_TOPK}
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QID_SQL}),
cos AS (
  SELECT e.vec_id AS doc_id,
         {_dot_sql('e.embedding', 'q.qv')} AS dot_s,
         {_dot_sql('e.embedding', 'e.embedding')} AS na_s,
         {_dot_sql('q.qv', 'q.qv')} AS nb_s
  FROM embeddings e, q
  WHERE e.vec_id <> {_QID_SQL}
),
vec AS (
  SELECT doc_id, CAST(row_number() OVER (
           ORDER BY round(CAST(dot_s AS DOUBLE)
             / (sqrt(CAST(na_s AS DOUBLE)) * sqrt(CAST(nb_s AS DOUBLE))), 6) DESC,
           doc_id ASC) AS BIGINT) AS r
  FROM cos
  ORDER BY round(CAST(dot_s AS DOUBLE)
    / (sqrt(CAST(na_s AS DOUBLE)) * sqrt(CAST(nb_s AS DOUBLE))), 6) DESC, doc_id ASC
  LIMIT {_TOPK}
),
fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         CAST(coalesce({_RRF_SCALE} // ({_RRF_K} + l.r), 0)
            + coalesce({_RRF_SCALE} // ({_RRF_K} + v.r), 0) AS BIGINT) AS rrf_pico,
         l.r AS lex_rank, v.r AS vec_rank
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, rrf_pico, lex_rank, vec_rank
FROM fused
ORDER BY rrf_pico DESC, doc_id ASC
LIMIT {_TOPK}
"""


@register("search_hybrid_rrf", oracle=_HYBRID_ORACLE,
          description="hybrid search: reciprocal-rank fusion of BM25 + cosine lists")
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuse the BM25 top-k and the cosine top-k by reciprocal-rank.

    Both inputs are already top-k (k rows each), so the fusion join is
    size-k regardless of corpus scale — the expensive parts are the
    two list builders, each independently scale-shaped (BM25: two hash
    aggs; cosine: scan + TakeOrdered). RRF contributions are exact
    integers: 1e12 DIV (60 + rank).
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    lex = (
        _bm25_scored(t["documents"])
        .orderBy(F.col("bm25_micro").desc(), F.col("doc_id").asc())
        .limit(_TOPK)
        .withColumn(
            "r",
            F.row_number()
            .over(Window.orderBy(F.col("bm25_micro").desc(), F.col("doc_id").asc()))
            .cast("long"),
        )
        .select("doc_id", "r")
    )
    emb = t["embeddings"]
    qid = _seed_rows(emb, 1)[0]["vec_id"]
    q = emb.where(F.col("vec_id") == qid).select(F.col("embedding").alias("qv"))
    vec = (
        emb.where(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding"), F.col("qv")).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        .limit(_TOPK)
        .withColumn(
            "r",
            F.row_number()
            .over(Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc()))
            .cast("long"),
        )
        .select("doc_id", "r")
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.expr(f"{_RRF_SCALE} div ({_RRF_K} + {r})"), F.lit(0).cast("long")
    )
    fused = (
        lex.alias("l")
        .join(vec.alias("v"), F.col("l.doc_id") == F.col("v.doc_id"), "full_outer")
        .select(
            F.coalesce(F.col("l.doc_id"), F.col("v.doc_id")).alias("doc_id"),
            (contrib("l.r") + contrib("v.r")).cast("long").alias("rrf_pico"),
            F.col("l.r").alias("lex_rank"),
            F.col("v.r").alias("vec_rank"),
        )
    )
    return fused.orderBy(F.col("rrf_pico").desc(), F.col("doc_id").asc()).limit(_TOPK)
