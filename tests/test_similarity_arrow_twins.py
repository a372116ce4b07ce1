"""Byte-identity pins for the r13 Arrow/numpy similarity twins.

The k-NN query paths now run the fixed-point bucket/norm/cosine
arithmetic as numpy over Arrow batches (guide §4.2) instead of
interpreted zip_with/aggregate expressions. The known risk is rounding
divergence (HALF_UP on the decimal shortest repr vs binary + 0.5 — see
`_np_round6`), so these tests pin the twins against the expression
forms on the REAL driver data, every row, exact equality — the codecs
byte-identity harness convention. sf0.01 and sf0.1 are covered by
tools/check_parity.py sweeps plus an in-session pin at round time; the
committed test runs at the suite's sf0.001 fixture plus hostile
literals (exact .5 products, negatives, zero vectors).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sm_etl_cloud_run_spark.operators.similarity import (
    _bucket_sq_pandas,
    _const_cosine_pandas,
    _fixed_point_dot,
    _fixed_point_sq_norm,
    _pair_cosine_pandas,
    _sq_norm_pandas,
    cosine_similarity,
    hyperplane_lsh_bucket,
)
from sm_etl_cloud_run_spark.tables import load_tables


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_tables(spark, sf_dir)["embeddings"]


def _planes(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(4).collect()
    return [[float(x) for x in rows[i]["embedding"]] for i in (1, 2, 3)]


def test_bucket_and_sq_twin_matches_expressions(emb):
    planes = _planes(emb)
    bsq = _bucket_sq_pandas(planes)
    both = emb.select(
        "vec_id",
        bsq(F.col("embedding")).alias("np"),
        hyperplane_lsh_bucket(F.col("embedding"), planes).alias("jb"),
        _fixed_point_sq_norm(F.col("embedding")).alias("jsq"),
    ).collect()
    assert both, "fixture embeddings present"
    for r in both:
        assert r["np"]["bucket"] == r["jb"], r["vec_id"]
        assert r["np"]["sq"] == r["jsq"], r["vec_id"]


def test_sq_norm_twin_matches_expression(emb):
    sq = _sq_norm_pandas()
    rows = emb.select(
        sq(F.col("embedding")).alias("np"),
        _fixed_point_sq_norm(F.col("embedding")).alias("jv"),
    ).collect()
    assert all(r["np"] == r["jv"] for r in rows)


def test_pair_cosine_twin_matches_expression_all_pairs(emb):
    # every ordered pair of the first 40 vectors — 1,560 pairs of real
    # driver data through both paths
    a = emb.orderBy("vec_id").limit(40).select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("va")
    )
    b = emb.orderBy("vec_id").limit(40).select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("vb")
    )
    pairs = a.crossJoin(b).where(F.col("ida") != F.col("idb")).select(
        "ida", "idb", "va", "vb",
        _fixed_point_sq_norm(F.col("va")).alias("sqa"),
        _fixed_point_sq_norm(F.col("vb")).alias("sqb"),
    )
    rows = pairs.select(
        "ida", "idb",
        _pair_cosine_pandas()(
            F.col("va"), F.col("vb"), F.col("sqa"), F.col("sqb")
        ).alias("np"),
        cosine_similarity(F.col("va"), F.col("vb")).alias("jv"),
    ).collect()
    assert len(rows) == 40 * 39
    bad = [(r["ida"], r["idb"], r["np"], r["jv"]) for r in rows if r["np"] != r["jv"]]
    assert not bad, bad[:5]


def test_const_cosine_twin_matches_expression(emb):
    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in seed["embedding"]]
    q = F.array(*[F.lit(v) for v in qvec])
    rows = emb.select(
        "vec_id",
        _const_cosine_pandas(qvec)(F.col("embedding")).alias("np"),
        F.round(
            _fixed_point_dot(F.col("embedding"), q).cast("double")
            / (
                F.sqrt(_fixed_point_sq_norm(F.col("embedding")).cast("double"))
                * F.sqrt(_fixed_point_sq_norm(q).cast("double"))
            ),
            6,
        ).alias("jv"),
    ).collect()
    bad = [(r["vec_id"], r["np"], r["jv"]) for r in rows if r["np"] != r["jv"]]
    assert not bad, bad[:5]


def test_round6_hostile_values(spark):
    # exact .5 products and boundary-repr cosines: vectors engineered so
    # dot/(na·nb) lands on 7-decimal shortest-repr boundaries
    hostile = [
        (1, [0.5, 0.5], [0.0000005, 1.0]),
        (2, [1.0, 0.0], [0.1234565, 1.0]),
        (3, [-1.0, 0.0], [0.9999995, 0.0000005]),
        (4, [0.0000015, 1.0], [1.0, 0.0000025]),
        (5, [0.0, 0.0], [1.0, 1.0]),  # zero vector → NaN through both
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, a, b in hostile], "pid long, va array<float>, vb array<float>"
    ).select(
        "pid", "va", "vb",
        _fixed_point_sq_norm(F.col("va")).alias("sqa"),
        _fixed_point_sq_norm(F.col("vb")).alias("sqb"),
    )
    rows = df.select(
        "pid",
        _pair_cosine_pandas()(
            F.col("va"), F.col("vb"), F.col("sqa"), F.col("sqb")
        ).alias("np"),
        cosine_similarity(F.col("va"), F.col("vb")).alias("jv"),
    ).collect()
    for r in rows:
        if r["jv"] is None or (isinstance(r["jv"], float) and r["jv"] != r["jv"]):
            assert r["np"] is None or r["np"] != r["np"], r["pid"]
        else:
            assert r["np"] == r["jv"], (r["pid"], r["np"], r["jv"])
