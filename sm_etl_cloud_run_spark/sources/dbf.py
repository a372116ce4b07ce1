"""DBC/DBF ingestion (SURVEY §2.1 S1) — distributed-parse scaffold.

The reference FTP-downloads DATASUS `.dbc` files, decompresses to `.dbf`
(`dbc2dbf`) and iterates records in chunks
(utilitarios/datasus_ftp.py:142-255), reading date fields as raw strings
(:41-46).

Spark-native shape: `spark.read.format("binaryFile")` lists the files as
(path, content) rows — one task per file — and `mapInPandas` parses each
DBF payload into all-string record batches. The chunked-generator loop
of the reference disappears into partition parallelism.

The `dbfread`/`dbc2dbf` libraries are not in this container, so the
per-record decode is gated behind an import-try; the Spark-side plumbing
(schema, batching, file-level parallelism) is real and tested with a
fake decoder.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _default_decoder(content: bytes) -> Iterator[dict]:
    try:
        import io

        from dbfread import DBF  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - library absent in container
        raise NotImplementedError(
            "DBF decoding requires `dbfread` (and `dbc2dbf` for .dbc); "
            "not available in this environment — pass a custom `decoder`."
        ) from exc
    raise NotImplementedError("wire dbfread over a temp file here")  # pragma: no cover


def read_dbf_files(
    spark: SparkSession,
    path_glob: str,
    columns: list[str],
    *,
    decoder: Callable[[bytes], Iterator[dict]] | None = None,
    batch_rows: int = 50_000,
) -> DataFrame:
    """Distributed DBF scan: one task per file, all-string output schema.

    `decoder(content) -> iterator of row dicts` does the per-file parse
    (production: dbc2dbf + dbfread; tests: a deterministic fake). Records
    are emitted in `batch_rows` pandas batches — the Spark analog of the
    reference's `passo` chunking, but per-task instead of global.
    """
    decode = decoder or _default_decoder
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
    binary = spark.read.format("binaryFile").load(path_glob).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows: list[dict] = []
                for rec in decode(bytes(content)):
                    rows.append({c: (None if rec.get(c) is None else str(rec.get(c))) for c in columns})
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=columns, dtype="object")
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=columns, dtype="object")

    return binary.mapInPandas(parse, schema)
