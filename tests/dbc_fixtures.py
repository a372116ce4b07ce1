"""Shared test fixtures for DATASUS container formats.

A minimal PKWARE-DCL encoder (exact inverse of the engine's decoder —
built from the same canonical Huffman tables) and a dBase III writer,
so tests can fabricate real `.dbf` / `.dbc` payloads byte-by-byte.
Test-only: the engine itself never compresses.
"""

from __future__ import annotations

import struct

from sm_etl_cloud_run_spark.sources import dbc


def canonical_codes(huffman):
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


LENCODES = canonical_codes(dbc._LENCODE)
DISTCODES = canonical_codes(dbc._DISTCODE)
LITCODES = canonical_codes(dbc._LITCODE)


class BitWriter:
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


class Imploder:
    """Tiny PKWARE DCL encoder: literals + explicit matches + end marker."""

    def __init__(self, *, coded_literals: bool = False, dict_bits: int = 4):
        self.w = BitWriter()
        self.coded = coded_literals
        self.dict_bits = dict_bits
        self.w.raw(1 if coded_literals else 0, 8)
        self.w.raw(dict_bits, 8)

    def literal(self, byte: int) -> None:
        self.w.bit(0)
        if self.coded:
            self.w.code(*LITCODES[byte])
        else:
            self.w.raw(byte, 8)

    def match(self, length: int, dist: int) -> None:
        self.w.bit(1)
        if length > 10:
            sym = next(
                s for s in range(16)
                if dbc._LEN_EXTRA[s]
                and dbc._LEN_BASE[s] <= length < dbc._LEN_BASE[s] + (1 << dbc._LEN_EXTRA[s])
            )
        else:
            sym = {2: 1, 3: 0}.get(length, length - 2)
        self.w.code(*LENCODES[sym])
        if dbc._LEN_EXTRA[sym]:
            self.w.raw(length - dbc._LEN_BASE[sym], dbc._LEN_EXTRA[sym])
        extra = 2 if length == 2 else self.dict_bits
        d = dist - 1
        self.w.code(*DISTCODES[d >> extra])
        self.w.raw(d & ((1 << extra) - 1), extra)

    def end(self) -> bytes:
        self.w.bit(1)
        sym = 15  # base 264, 8 extra bits: 264 + 255 = 519 = end marker
        self.w.code(*LENCODES[sym])
        self.w.raw(dbc._END_LENGTH - dbc._LEN_BASE[sym], dbc._LEN_EXTRA[sym])
        return self.w.finish()


def implode(data: bytes, **kw) -> bytes:
    enc = Imploder(**kw)
    for b in data:
        enc.literal(b)
    return enc.end()


def make_dbf(fields: list[tuple[str, str, int]], rows: list[list[str]]) -> bytes:
    """Assemble a dBase III payload: 32-byte header + descriptors + records."""
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
            body += enc.rjust(flen) if ftype == "N" else enc.ljust(flen)
    return bytes(header) + bytes(body) + b"\x1a"


def make_dbc(dbf: bytes) -> bytes:
    """Compress a `.dbf` into the DATASUS `.dbc` layout (CRC unchecked)."""
    (hsize,) = struct.unpack_from("<H", dbf, 8)
    return dbf[:hsize] + b"\x00\x00\x00\x00" + implode(dbf[hsize:])
