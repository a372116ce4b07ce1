"""DATASUS `.dbc` decompression (SURVEY §2.1 S1) — pure Python.

A `.dbc` file is a dBase (`.dbf`) file whose record section is
compressed with the PKWARE Data Compression Library "implode" format:

    [ DBF header, verbatim, `hsize` bytes (hsize = uint16 LE at offset 8) ]
    [ 4-byte CRC32 ]
    [ PKWARE-DCL-compressed record section ]

The reference shells out to `dbc2dbf` for this step
(utilitarios/datasus_ftp.py:142-255). Here the decompressor is
reimplemented from the public-domain algorithm (Mark Adler's blast.c,
distributed with zlib): LSB-first bit stream, three fixed canonical
Huffman tables (literals / lengths / distances) stored as
run-length-compact code lengths, and an LZ77 window of 1024–4096 bytes.
Pure Python keeps the container dependency-free; the per-file cost sits
inside a `mapInPandas` task (sources/dbf.py), so throughput scales with
executors, not the driver.
"""

from __future__ import annotations

import struct

_MAXBITS = 13

# Run-length-compact canonical code lengths (high nibble + 1 = repeat,
# low nibble = bit length) for the three fixed Huffman codes of the
# PKWARE DCL format.
_LITLEN = [
    11, 124, 8, 7, 28, 7, 188, 13, 76, 4, 10, 8, 12, 10, 12, 10, 8, 23, 8,
    9, 7, 6, 7, 8, 7, 6, 55, 8, 23, 24, 12, 11, 7, 9, 11, 12, 6, 7, 22, 5,
    7, 24, 6, 11, 9, 6, 7, 22, 7, 11, 38, 7, 9, 8, 25, 11, 8, 11, 9, 12,
    8, 12, 5, 38, 5, 38, 5, 11, 7, 5, 6, 21, 6, 10, 53, 8, 7, 24, 10, 27,
    44, 253, 253, 253, 252, 252, 252, 13, 12, 45, 12, 45, 12, 61, 12, 45,
    44, 173,
]
_LENLEN = [2, 35, 36, 53, 38, 23]
_DISTLEN = [2, 20, 53, 230, 247, 151, 248]

# length symbol -> base copy length / number of extra raw bits
_LEN_BASE = [3, 2, 4, 5, 6, 7, 8, 9, 10, 12, 16, 24, 40, 72, 136, 264]
_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8]

_END_LENGTH = 519  # length code that terminates the stream


def _expand_lengths(rep: list[int]) -> list[int]:
    """Expand the compact repeat/length byte list into per-symbol bit lengths."""
    lengths: list[int] = []
    for byte in rep:
        lengths.extend([byte & 15] * ((byte >> 4) + 1))
    return lengths


def _construct(rep: list[int]) -> tuple[list[int], list[int]]:
    """Build (count-per-bit-length, symbols-in-canonical-order) tables."""
    lengths = _expand_lengths(rep)
    count = [0] * (_MAXBITS + 1)
    for ln in lengths:
        count[ln] += 1
    offs = [0] * (_MAXBITS + 1)
    for ln in range(1, _MAXBITS):
        offs[ln + 1] = offs[ln] + count[ln]
    symbol = [0] * sum(count[1:])
    for sym, ln in enumerate(lengths):
        if ln != 0:
            symbol[offs[ln]] = sym
            offs[ln] += 1
    return count, symbol


_LITCODE = _construct(_LITLEN)
_LENCODE = _construct(_LENLEN)
_DISTCODE = _construct(_DISTLEN)


class CorruptDbcError(ValueError):
    pass


class _Bits:
    """LSB-first bit reader over the compressed byte stream."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.bitcnt = 0

    def bits(self, need: int) -> int:
        val = self.bitbuf
        while self.bitcnt < need:
            if self.pos >= len(self.data):
                raise CorruptDbcError("ran out of compressed input")
            val |= self.data[self.pos] << self.bitcnt
            self.pos += 1
            self.bitcnt += 8
        self.bitbuf = val >> need
        self.bitcnt -= need
        return val & ((1 << need) - 1)

    def decode(self, huffman: tuple[list[int], list[int]]) -> int:
        """Decode one canonical-Huffman symbol (stream bits are inverted)."""
        counts, symbols = huffman
        code = first = index = 0
        length = 1
        bitbuf = self.bitbuf
        left = self.bitcnt
        while True:
            while left:
                left -= 1
                code |= (bitbuf & 1) ^ 1
                bitbuf >>= 1
                count = counts[length]
                if code < first + count:
                    self.bitbuf = bitbuf
                    self.bitcnt = (self.bitcnt - length) & 7
                    return symbols[index + (code - first)]
                index += count
                first = (first + count) << 1
                code <<= 1
                length += 1
            left = (_MAXBITS + 1) - length
            if left == 0:
                raise CorruptDbcError("invalid Huffman code")
            if self.pos >= len(self.data):
                raise CorruptDbcError("ran out of compressed input")
            bitbuf = self.data[self.pos]
            self.pos += 1
            left = min(left, 8)


def explode(data: bytes) -> bytes:
    """Decompress a PKWARE DCL ("implode") stream."""
    s = _Bits(data)
    lit = s.bits(8)
    if lit > 1:
        raise CorruptDbcError(f"bad literal-mode byte: {lit}")
    dict_bits = s.bits(8)
    if not 4 <= dict_bits <= 6:
        raise CorruptDbcError(f"bad dictionary-size byte: {dict_bits}")

    out = bytearray()
    while True:
        if s.bits(1):
            sym = s.decode(_LENCODE)
            length = _LEN_BASE[sym] + s.bits(_LEN_EXTRA[sym])
            if length == _END_LENGTH:
                break
            extra = 2 if length == 2 else dict_bits
            dist = (s.decode(_DISTCODE) << extra) + s.bits(extra) + 1
            if dist > len(out):
                raise CorruptDbcError("distance reaches before stream start")
            # byte-by-byte: overlapping copies replicate recent output
            start = len(out) - dist
            for i in range(length):
                out.append(out[start + i])
        else:
            out.append(s.decode(_LITCODE) if lit else s.bits(8))
    return bytes(out)


def dbc_to_dbf(content: bytes) -> bytes:
    """Reassemble a `.dbf` from a DATASUS `.dbc` payload."""
    if len(content) < 12:
        raise CorruptDbcError("file too short for a DBF pre-header")
    (hsize,) = struct.unpack_from("<H", content, 8)
    if hsize < 32 or hsize + 4 > len(content):
        raise CorruptDbcError(f"implausible DBF header size {hsize}")
    header = content[:hsize]
    records = explode(content[hsize + 4:])  # 4 bytes of CRC32 precede data
    return header + records
