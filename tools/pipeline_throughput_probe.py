"""Single-node throughput: Spark `transform_fact` vs an equivalent
vectorized-pandas transform on identical PA-shaped data.

Usage: python tools/pipeline_throughput_probe.py [row_counts...]
       (default: 200000 1000000 — 200k is the reference's PA chunk size)

The reference (ImpulsoGov/sm-etl-cloud-run) runs its stage-1 transform
as pandas on one Cloud Run container, mostly row-wise
`transform_column` lambdas (etl/siasus_procedimentos_ambulatoriais.py:
229-356). The pandas twin below re-implements OUR spec semantics with
the most favorable vectorized pandas available — a GENEROUS stand-in
for the reference's single-node path (which also pays a per-row uuid7
lambda the twin does NOT pay). Fairness notes: both sides use their
cheapest vectorized row-id (pandas: hex of a range; Spark:
deterministic sha2 — both stay off the row-wise-Python path the
reference uses), and the Spark input is cached + materialized before
timing so the measurement is the transform, not the driver upload
(staged through local parquet — the medium real chunks arrive in; an
object cache of ~60 string columns measurably GC-throttles the scan).

Prints one JSON line per size: rows/s for both paths and the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sm_etl_cloud_run_spark.pipelines import PA_SPEC, transform_fact
from sm_etl_cloud_run_spark.session import get_spark

_OUTCOME = ("obito", "encerramento", "permanencia", "alta", "transferencia")


def make_raw(n: int, seed: int = 42) -> pd.DataFrame:
    """PA-shaped all-string frame with realistic value mixes."""
    rng = np.random.default_rng(seed)
    cols: dict[str, np.ndarray] = {}
    month = rng.choice(["202407", "202408", "000000"], n, p=[0.45, 0.45, 0.1])
    for raw, canon in PA_SPEC.rename.items():
        if canon in PA_SPEC.yyyymm_dates:
            cols[raw] = month
        elif canon in PA_SPEC.bool01:
            cols[raw] = rng.choice(["0", "1", ""], n, p=[0.45, 0.45, 0.1])
        elif canon in PA_SPEC.flag_true:
            cols[raw] = rng.choice(["M", "I"], n)
        elif canon in PA_SPEC.zeros_to_null:
            cols[raw] = rng.choice(["1234567", "0000000", ""], n, p=[0.6, 0.3, 0.1])
        elif canon in PA_SPEC.nines_to_null:
            cols[raw] = rng.choice(["123456", "999999"], n)
        elif canon == "usuario_idade":
            cols[raw] = rng.choice(["034", "999", ""], n, p=[0.8, 0.1, 0.1])
        elif canon in ("quantidade_apresentada", "quantidade_aprovada"):
            cols[raw] = rng.integers(1, 99, n).astype(str)
        elif canon in ("valor_apresentado", "valor_aprovado"):
            cols[raw] = np.char.add(rng.integers(1, 9999, n).astype(str), ".45")
        elif canon == "servico_especializado_id_scnes":
            cols[raw] = rng.choice(["115001", "114002"], n)
        else:
            cols[raw] = rng.choice(["A1B2C3", "X9Y8", ""], n, p=[0.6, 0.3, 0.1])
    return pd.DataFrame(cols)


def pandas_transform(raw: pd.DataFrame) -> pd.DataFrame:
    """Vectorized-pandas twin of transform_fact for PA_SPEC (no panel/
    condition filters, no dims — same configuration the Spark side runs)."""
    df = raw.copy()
    df.columns = [c.strip().upper() for c in df.columns]
    df = df.rename(columns={k.upper(): v for k, v in PA_SPEC.rename.items()})
    for c in PA_SPEC.yyyymm_dates:
        df[c] = pd.to_datetime(df[c], format="%Y%m", errors="coerce")
    date_cols = set(PA_SPEC.yyyymm_dates)
    for c in df.columns:
        if c not in date_cols:
            df[c] = df[c].replace("", np.nan)
    for c in PA_SPEC.zeros_to_null:
        df[c] = df[c].mask(df[c].str.fullmatch("0+", na=False))
    for c in PA_SPEC.nines_to_null:
        df[c] = df[c].mask(df[c].str.fullmatch("9+", na=False))
    for c, vals in PA_SPEC.sentinels.items():
        df[c] = df[c].mask(df[c].isin(vals))
    for c in PA_SPEC.bool01:
        df[c] = df[c].map({"0": False, "1": True})
    for c, truthy in PA_SPEC.flag_true.items():
        df[c] = df[c] == truthy
    guard, targets = PA_SPEC.null_flags_when_null
    mask = df[guard].isna()
    for c in targets:
        df.loc[mask, c] = np.nan
    for src, (head, tail) in PA_SPEC.split3.items():
        df[head] = df[src].str[:3]
        df[tail] = df[src].str[3:]
        df = df.drop(columns=[src])
    # P9 row id — cheapest vectorized form (the reference's own
    # row-wise uuid7 lambda would be far slower; not charged here)
    df["id"] = pd.Series(np.arange(len(df))).map("{:032x}".format)
    return df


def probe(spark, n: int) -> dict:
    raw_pd = make_raw(n)

    t0 = time.perf_counter()
    out_pd = pandas_transform(raw_pd)
    pandas_sec = time.perf_counter() - t0
    assert len(out_pd) == n

    staged = os.path.join("/tmp", f"throughput_probe_{n}.parquet")
    spark.createDataFrame(raw_pd).write.mode("overwrite").parquet(staged)
    raw_spark = spark.read.parquet(staged)
    raw_spark.count()  # warm the page cache before timing
    t0 = time.perf_counter()
    n_spark = transform_fact(raw_spark, PA_SPEC, deterministic_ids=True).count()
    spark_sec = time.perf_counter() - t0
    assert n_spark == n

    return {
        "rows": n,
        "pandas_sec": round(pandas_sec, 2),
        "spark_sec": round(spark_sec, 2),
        "pandas_rows_per_sec": int(n / pandas_sec),
        "spark_rows_per_sec": int(n / spark_sec),
        "speedup": round(pandas_sec / spark_sec, 2),
    }


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_spark("throughput-probe")
    probe(spark, 20_000)  # codegen warmup
    for n in sizes:
        print(json.dumps(probe(spark, n)))


if __name__ == "__main__":
    main()
