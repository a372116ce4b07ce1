"""DATASUS `.dbc`/`.dbf` ingestion tests.

The test encoder below is the exact inverse of the decoder's canonical
Huffman tables (built from the same compact length lists), so the
roundtrips exercise the real bit-level format: LSB-first stream,
inverted code bits, raw extra bits, LZ77 overlapping copies.
"""

from __future__ import annotations

import struct

import pytest

from sm_etl_cloud_run_spark.sources import dbc
from sm_etl_cloud_run_spark.sources.dbf import (
    decode_datasus_bytes,
    parse_dbf_bytes,
    read_dbf_files,
)

# ---------------------------------------------------------------------------
# fixtures: PKWARE-DCL encoder + minimal DBF writer (test-only)
# ---------------------------------------------------------------------------


def _canonical_codes(huffman):
    """sym -> (code, bitlength) in the decoder's (inverted) code space."""
    counts, symbols = huffman
    codes = {}
    first = 0
    index = 0
    for length in range(1, dbc._MAXBITS + 1):
        for i in range(counts[length]):
            codes[symbols[index + i]] = (first + i, length)
        index += counts[length]
        first = (first + counts[length]) << 1
    return codes


_LENCODES = _canonical_codes(dbc._LENCODE)
_DISTCODES = _canonical_codes(dbc._DISTCODE)
_LITCODES = _canonical_codes(dbc._LITCODE)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.cnt = 0

    def bit(self, b: int) -> None:
        self.cur |= (b & 1) << self.cnt
        self.cnt += 1
        if self.cnt == 8:
            self.out.append(self.cur)
            self.cur = 0
            self.cnt = 0

    def raw(self, value: int, nbits: int) -> None:  # LSB-first
        for i in range(nbits):
            self.bit((value >> i) & 1)

    def code(self, code: int, length: int) -> None:  # MSB-first, inverted
        for i in range(length - 1, -1, -1):
            self.bit(((code >> i) & 1) ^ 1)

    def finish(self) -> bytes:
        if self.cnt:
            self.out.append(self.cur)
        return bytes(self.out)


class _Imploder:
    """Tiny PKWARE DCL encoder: literals + explicit matches + end marker."""

    def __init__(self, *, coded_literals: bool = False, dict_bits: int = 4):
        self.w = _BitWriter()
        self.coded = coded_literals
        self.dict_bits = dict_bits
        self.w.raw(1 if coded_literals else 0, 8)
        self.w.raw(dict_bits, 8)

    def literal(self, byte: int) -> None:
        self.w.bit(0)
        if self.coded:
            self.w.code(*_LITCODES[byte])
        else:
            self.w.raw(byte, 8)

    def match(self, length: int, dist: int) -> None:
        self.w.bit(1)
        sym = next(
            s for s in range(16)
            if dbc._LEN_EXTRA[s] and
            dbc._LEN_BASE[s] <= length < dbc._LEN_BASE[s] + (1 << dbc._LEN_EXTRA[s])
        ) if length > 10 else {2: 1, 3: 0}.get(length, length - 2)
        self.w.code(*_LENCODES[sym])
        if dbc._LEN_EXTRA[sym]:
            self.w.raw(length - dbc._LEN_BASE[sym], dbc._LEN_EXTRA[sym])
        extra = 2 if length == 2 else self.dict_bits
        d = dist - 1
        self.w.code(*_DISTCODES[d >> extra])
        self.w.raw(d & ((1 << extra) - 1), extra)

    def end(self) -> bytes:
        self.w.bit(1)
        sym = 15  # base 264, 8 extra bits: 264 + 255 = 519 = end marker
        self.w.code(*_LENCODES[sym])
        self.w.raw(dbc._END_LENGTH - dbc._LEN_BASE[sym], dbc._LEN_EXTRA[sym])
        return self.w.finish()


def _implode(data: bytes, **kw) -> bytes:
    enc = _Imploder(**kw)
    for b in data:
        enc.literal(b)
    return enc.end()


def _make_dbf(fields: list[tuple[str, str, int]], rows: list[list[str]]) -> bytes:
    hsize = 32 + 32 * len(fields) + 1
    rsize = 1 + sum(f[2] for f in fields)
    header = bytearray(32)
    header[0] = 0x03
    struct.pack_into("<I", header, 4, len(rows))
    struct.pack_into("<H", header, 8, hsize)
    struct.pack_into("<H", header, 10, rsize)
    for name, ftype, flen in fields:
        d = bytearray(32)
        d[0:11] = name.encode("ascii").ljust(11, b"\x00")
        d[11] = ord(ftype)
        d[16] = flen
        header += d
    header += b"\x0d"
    body = bytearray()
    for row in rows:
        body += b" "  # not-deleted flag
        for (name, ftype, flen), val in zip(fields, row):
            enc = val.encode("latin-1")
            body += enc.ljust(flen) if ftype != "N" else enc.rjust(flen)
    return bytes(header) + bytes(body) + b"\x1a"


_FIELDS = [("PA_CODUNI", "C", 7), ("PA_QTDAPR", "N", 6), ("PA_MVM", "D", 8)]
_ROWS = [
    ["2077485", "12", "20240801"],
    ["00\xe7001", "", "20240802"],  # latin-1 ç survives; empty numeric → None
]


def _make_dbc(dbf: bytes) -> bytes:
    (hsize,) = struct.unpack_from("<H", dbf, 8)
    compressed = _implode(dbf[hsize:])
    return dbf[:hsize] + b"\x00\x00\x00\x00" + compressed  # CRC unchecked


# ---------------------------------------------------------------------------
# explode: bit-level format
# ---------------------------------------------------------------------------


def test_explode_uncoded_literals_roundtrip():
    data = bytes(range(256)) * 3
    assert dbc.explode(_implode(data)) == data


def test_explode_coded_literals_roundtrip():
    data = b"SIASUS PA do DATASUS em texto plano, acentua\xe7\xe3o."
    assert dbc.explode(_implode(data, coded_literals=True)) == data


def test_explode_overlapping_copy():
    enc = _Imploder()
    for b in b"AB":
        enc.literal(b)
    enc.match(6, 2)  # overlapping: replicates "AB" forward
    assert dbc.explode(enc.end()) == b"ABABABAB"


def test_explode_long_match_and_big_dict():
    prefix = bytes(range(64))
    enc = _Imploder(dict_bits=6)
    for b in prefix:
        enc.literal(b)
    enc.match(300, 64)  # length needs extra bits; dist uses 6-bit low part
    out = dbc.explode(enc.end())
    assert out[:64] == prefix
    assert out[64:] == (prefix * 5)[:300]


def test_explode_rejects_bad_header():
    with pytest.raises(dbc.CorruptDbcError):
        dbc.explode(b"\x02\x04\x00")
    with pytest.raises(dbc.CorruptDbcError):
        dbc.explode(b"\x00\x09\x00")


def test_explode_rejects_distance_before_start():
    enc = _Imploder()
    enc.literal(ord("A"))
    enc.match(3, 2)  # only 1 byte of history
    with pytest.raises(dbc.CorruptDbcError):
        dbc.explode(enc.end())


# ---------------------------------------------------------------------------
# DBF parse + .dbc assembly
# ---------------------------------------------------------------------------


def test_parse_dbf_bytes_all_string():
    recs = list(parse_dbf_bytes(_make_dbf(_FIELDS, _ROWS)))
    assert recs == [
        {"PA_CODUNI": "2077485", "PA_QTDAPR": "12", "PA_MVM": "20240801"},
        {"PA_CODUNI": "00\xe7001", "PA_QTDAPR": None, "PA_MVM": "20240802"},
    ]


def test_parse_dbf_skips_deleted_records():
    dbf = bytearray(_make_dbf(_FIELDS, _ROWS))
    (hsize,) = struct.unpack_from("<H", dbf, 8)
    dbf[hsize] = 0x2A  # delete first record
    recs = list(parse_dbf_bytes(bytes(dbf)))
    assert len(recs) == 1 and recs[0]["PA_CODUNI"] == "00\xe7001"


def test_dbc_to_dbf_roundtrip():
    dbf = _make_dbf(_FIELDS, _ROWS)
    rebuilt = dbc.dbc_to_dbf(_make_dbc(dbf))
    # header + records identical; trailing 0x1A EOF included in compressed body
    assert rebuilt == dbf


def test_decode_datasus_autodetects_dbf_vs_dbc():
    dbf = _make_dbf(_FIELDS, _ROWS)
    assert list(decode_datasus_bytes(dbf)) == list(decode_datasus_bytes(_make_dbc(dbf)))


def test_read_dbf_files_end_to_end_dbc(spark, tmp_path):
    dbf = _make_dbf(_FIELDS, _ROWS)
    (tmp_path / "PASP2408.dbc").write_bytes(_make_dbc(dbf))
    (tmp_path / "PASP2409.dbf").write_bytes(dbf)
    df = read_dbf_files(spark, str(tmp_path), ["PA_CODUNI", "PA_QTDAPR", "PA_MVM"])
    rows = sorted(
        (r["PA_CODUNI"], r["PA_QTDAPR"], r["PA_MVM"]) for r in df.collect()
    )
    assert rows == sorted(
        [("2077485", "12", "20240801"), ("00\xe7001", None, "20240802")] * 2
    )
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)
