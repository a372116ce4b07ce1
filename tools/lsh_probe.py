"""LSH dedup pipeline probe at large document multipliers.

Usage: python tools/lsh_probe.py [multipliers...]   (default: 64 256)

Multiplies ONLY the documents table (doc_id offset per copy, so every
copy is an exact clone set of the base corpus) and times the full
near-dup pipeline — shingle → MinHash signatures → LSH band bucketing →
cluster assignment — for both hash families:

- `md5`      — the oracle-checked default (cross-engine deterministic)
- `xxhash64` — the production fast path (codegen'd 64-bit ints)

Cluster assignment (`lsh_dedup_groups`) rather than pair enumeration is
the variant measured: with every doc cloned N× the pair count would be
O(N²) per cluster while groups stay linear — exactly the regime a
100 TB corpus with heavy boilerplate duplication hits.

Prints one JSON line per (multiplier, hash_fn) with wall seconds and
the dedup outcome (distinct group representatives == base corpus size
keeps the run honest).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sm_etl_cloud_run_spark.operators.dedup import (
    lsh_dedup_groups,
    minhash_signatures,
)
from sm_etl_cloud_run_spark.session import get_spark
from tools.scale_probe import PROBE_DIR

BASE = "/root/testdata/sf0.1/documents.parquet"


def build_docs(spark, mult: int) -> str:
    out = os.path.join(PROBE_DIR, f"docs-x{mult}.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):  # complete write only
        return out
    docs = spark.read.parquet(BASE).select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = [docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n)) for i in range(mult)]
    scaled = copies[0]
    for c in copies[1:]:
        scaled = scaled.unionByName(c)
    scaled.repartition(32).write.mode("overwrite").parquet(out)
    return out


def probe(spark, mult: int, hash_fn: str) -> dict:
    path = build_docs(spark, mult)
    docs = spark.read.parquet(path)
    t0 = time.perf_counter()
    sigs = minhash_signatures(docs, num_hashes=8, hash_fn=hash_fn)
    groups = lsh_dedup_groups(sigs)
    n_docs, n_reps = groups.agg(
        F.count(F.lit(1)), F.countDistinct("group_rep")
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    return {
        "mult": mult,
        "hash_fn": hash_fn,
        "docs": n_docs,
        "group_reps": n_reps,
        "sec": wall,
        "docs_per_sec": int(n_docs / wall),
    }


def main() -> None:
    args = sys.argv[1:]
    gate = "--gate" in args
    mults = [int(m) for m in args if m != "--gate"] or [64, 256]
    spark = get_spark("lsh-probe")
    os.makedirs(PROBE_DIR, exist_ok=True)
    for mult in mults:
        if gate:
            print(json.dumps(gate_probe(spark, mult)))
        else:
            for fn in ("md5", "xxhash64"):
                print(json.dumps(probe(spark, mult, fn)))




# ---------------------------------------------------------------------------
# --gate mode: the clone-collapse decision, measured end-to-end
# ---------------------------------------------------------------------------

def gate_probe(spark, mult: int, hash_fn: str = "xxhash64") -> dict:
    """Exercise the documented auto-gate (dedup_clone_collapse_gate /
    dedup_component_size_histogram's bucket-≥6 signal) on the
    clone-pathology fixture: compute the gate decision, then run the
    FULL transitive fixpoint (`lsh_dedup_components`) both ways —
    directly on the cloned corpus, and with exact clones collapsed to
    representatives first (fixpoint on reps, assignment expanded back
    through the clone key). Component count must be invariant; the two
    wall times are the cost the gate chooses between."""
    from sm_etl_cloud_run_spark.operators.dedup import lsh_dedup_components

    path = build_docs(spark, mult)
    docs = spark.read.parquet(path)

    t0 = time.perf_counter()
    clones = docs.groupBy(F.md5("text").alias("ck")).agg(
        F.min("doc_id").alias("rep"), F.count(F.lit(1)).alias("cnt")
    )
    clones.persist()
    n_docs, n_keys, max_clone = clones.agg(
        F.sum("cnt"), F.count(F.lit(1)), F.max("cnt")
    ).collect()[0]
    gate_collapse = bool(max_clone >= 6)
    gate_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    comp_raw = lsh_dedup_components(
        minhash_signatures(docs, num_hashes=8, hash_fn=hash_fn)
    )
    n_comp_raw = comp_raw.agg(F.countDistinct("group_rep")).collect()[0][0]
    raw_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    rep_docs = docs.join(clones.select(F.col("rep").alias("doc_id")), "doc_id")
    comp_rep = lsh_dedup_components(
        minhash_signatures(rep_docs, num_hashes=8, hash_fn=hash_fn)
    )
    # expand the rep-level assignment back to every clone member
    assigned = (
        docs.select("doc_id", F.md5("text").alias("ck"))
        .join(clones.select("ck", "rep"), "ck")
        .join(
            comp_rep.select(F.col("doc_id").alias("rep"), "group_rep"), "rep"
        )
    )
    n_assigned, n_comp_collapsed = assigned.agg(
        F.count(F.lit(1)), F.countDistinct("group_rep")
    ).collect()[0]
    collapsed_sec = round(time.perf_counter() - t0, 2)
    clones.unpersist()

    return {
        "mode": "gate",
        "mult": mult,
        "hash_fn": hash_fn,
        "docs": n_docs,
        "clone_keys": n_keys,
        "max_clone_size": max_clone,
        "gate_collapse": gate_collapse,
        "gate_sec": gate_sec,
        "fixpoint_raw_sec": raw_sec,
        "fixpoint_collapsed_sec": collapsed_sec,
        "speedup": round(raw_sec / collapsed_sec, 2) if collapsed_sec else None,
        "components_raw": n_comp_raw,
        "components_collapsed": n_comp_collapsed,
        "components_match": n_comp_raw == n_comp_collapsed,
        "docs_assigned": n_assigned,
    }


if __name__ == "__main__":
    main()
