"""Baseline + progressive JPEG (ITU-T T.81) — encoder + decoder, pure
stdlib, for the multimodal decode layer.

Scope (honest boundary): 8-bit Huffman DCT — baseline sequential
(SOF0) and progressive (SOF2: spectral selection + successive
approximation, DC and AC first/refinement scans, EOB runs, multi-scan
table redefinition), grayscale or YCbCr color (4:4:4 and 4:2:0
chroma subsampling), DRI/RSTn restart markers in both modes;
arithmetic coding and the hierarchical/lossless SOFs raise
NotImplementedError. Within that scope the decode is REAL: marker
walk, DQT/DHT table parsing, Huffman entropy decode with byte
unstuffing, the T.81 A.2.3 MCU geometry with per-component
resolutions + nearest chroma upsample, differential DC with restart
resets, run-length AC, dezigzag, dequantization and the full 2-D
IDCT with the spec's level shift + clamp.

Reference behavior: T.81 Annex F (entropy coding), Annex G
(progressive: G.1.2 encode / G.2 decode control), Annex K (the
example quantization + Huffman tables, used by the encoders).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# zigzag scan order: index i of the scan -> (row, col) raster position
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# T.81 Annex K.1 luminance quantization table (raster order)
STD_QUANT = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)

# T.81 Annex K.1 chrominance quantization table (raster order)
STD_QUANT_C = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

# Annex K.3 typical Huffman tables for luminance DC / AC:
# (bits[1..16], values)
STD_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
STD_DC_VALS = tuple(range(12))
STD_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
STD_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)

# precomputed cos lookup for the float (I)DCT
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _build_codes(bits, values):
    """T.81 C.2: canonical Huffman (code, length) per symbol."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTable:
    """Decoder-side canonical Huffman table as a 16-bit-lookahead LUT
    (r13): ``lut_len[peek16]`` is the code length (0 = no code with
    that prefix — invalid stream), ``lut_sym[peek16]`` the decoded
    symbol. The canonical-prefix property makes every entry in a
    code's 2^(16-len) lookahead range identical, so one peek + two
    list indexes replace the old bit-at-a-time tree walk (up to 16
    dict probes per symbol)."""

    __slots__ = ("lut_sym", "lut_len")

    def __init__(self, bits, values):
        sym = [0] * 65536
        ln = [0] * 65536
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if code >= (1 << length):
                    # over-subscribed DHT: more codes than the length
                    # can hold. Without this check the slice bounds
                    # exceed 65536 and the assignment silently EXTENDS
                    # the LUT lists past index 65535 — hiding the
                    # corruption and growing memory instead of
                    # rejecting the table.
                    raise ValueError(
                        "JPEG: over-subscribed Huffman table"
                    )
                start = code << (16 - length)
                end = (code + 1) << (16 - length)
                sym[start:end] = [values[k]] * (end - start)
                ln[start:end] = [length] * (end - start)
                code += 1
                k += 1
            code <<= 1
        self.lut_sym = sym
        self.lut_len = ln


# DHT specs repeat across payloads (the encoders ship the Annex K
# tables in every file), so the 64 Ki-entry LUTs build once per
# process, not once per decode. BOUNDED: real-world corpora carry
# per-image optimized tables (~4 unique DHT specs per file at ~1 MB
# of LUT each), so an unbounded cache would grow without limit in a
# long-lived UDF worker — evict oldest-inserted past the cap.
_HUFF_LUT_CACHE: dict = {}
_HUFF_LUT_CACHE_MAX = 64


def _build_decode_table(bits, values):
    """DHT spec -> cached ``_HuffTable`` for the decoder."""
    key = (tuple(bits), tuple(values))
    t = _HUFF_LUT_CACHE.get(key)
    if t is None:
        t = _HuffTable(key[0], key[1])
        while len(_HUFF_LUT_CACHE) >= _HUFF_LUT_CACHE_MAX:
            _HUFF_LUT_CACHE.pop(next(iter(_HUFF_LUT_CACHE)))
        _HUFF_LUT_CACHE[key] = t
    return t


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary
        return bytes(self.out)

    def restart(self, idx: int) -> None:
        """1-pad to a byte boundary and emit the RSTn marker (markers
        are NOT byte-stuffed — they are the one FF sequence a scan
        may legally contain)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.out += bytes((0xFF, 0xD0 + (idx & 7)))


class _BitReader:
    """Restart-segment entropy reader (r13). The scan slice is
    pre-split at its byte-aligned RSTn markers into INDEPENDENTLY
    decodable segments — T.81 F.2.1.3.1 resets the DC predictors and
    EOB runs at every restart, so no decode state crosses a marker.
    That boundary is the within-payload fan-out point a cluster
    decode parallelizes on (each segment carries a fixed MCU count:
    restart_interval, remainder in the last); here the segments
    decode in sequence, each through a fast path: one C-level
    ``bytes.replace(b"\\xff\\x00", b"\\xff")`` pass strips the byte
    stuffing (the left-to-right non-overlapping scan is exactly the
    unstuff rule), and read_symbol decodes against the table's 16-bit
    lookahead LUT instead of walking bits. Public contract unchanged:
    read_bit / read_bits / read_symbol / expect_restart, ValueError
    on malformed streams.

    Malformed-stream divergence from the pre-r13 bit-at-a-time
    reader (valid streams are unaffected; every error is still a
    ValueError, but messages/points differ): (a) an EOI-terminated
    final segment feeds up to 8 bits of 1-pad past the marker where
    the old reader fed ~2 — a decode that needs more pad than that
    still raises, just slightly later; (b) an unexpected in-stream
    RSTn (one not aligned with the restart interval) surfaces when
    the current segment EXHAUSTS ('entropy stream exhausted' /
    expect_restart mismatch) instead of as an immediate
    unexpected-marker error at the byte position. Callers that match
    on exact malformed-stream messages should match the class, not
    the text."""

    __slots__ = (
        "segs", "seg_rsts", "si", "clean", "nbytes", "bytepos",
        "acc", "n", "pad_left", "eoi_pad",
    )

    def __init__(self, data: bytes):
        segs: list = []
        rsts: list = []
        start = 0
        end_at = len(data)
        self.eoi_pad = False
        p = data.find(b"\xff")
        while p != -1:
            if p + 1 >= len(data):
                # dangling 0xFF at the very end: exclude it so a read
                # that needs those bits raises instead of consuming a
                # marker prefix as entropy data (the old reader's
                # "dangling 0xFF" contract)
                end_at = p
                break
            nxt = data[p + 1]
            if nxt == 0x00:
                p = data.find(b"\xff", p + 2)  # stuffing: unstuffed below
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(data[start:p])
                rsts.append(nxt - 0xD0)
                start = p + 2
                p = data.find(b"\xff", p + 2)
                continue
            # EOI (pad bits may legally be read past it) or a foreign
            # marker (strict end) terminates the entropy data
            end_at = p
            self.eoi_pad = nxt == 0xD9
            break
        segs.append(data[start:end_at])
        rsts.append(None)
        self.segs = [s.replace(b"\xff\x00", b"\xff") for s in segs]
        self.seg_rsts = rsts
        self.si = 0
        self._load(0)

    def _load(self, i: int) -> None:
        self.clean = self.segs[i]
        self.nbytes = len(self.clean)
        self.bytepos = 0
        self.acc = 0
        self.n = 0
        # only the final segment of an EOI-terminated stream may feed
        # 1-bits past its end (the old reader's FFD9 pad behavior)
        last = self.seg_rsts[i] is None
        self.pad_left = 8 if (last and self.eoi_pad) else 0

    def _ensure(self, k: int) -> None:
        # trim consumed high bits so acc stays a machine-word int
        self.acc &= (1 << self.n) - 1
        while self.n < k:
            if self.bytepos < self.nbytes:
                self.acc = (self.acc << 8) | self.clean[self.bytepos]
                self.bytepos += 1
            elif self.pad_left:
                self.acc = (self.acc << 8) | 0xFF
                self.pad_left -= 1
            else:
                raise ValueError("JPEG: entropy stream exhausted")
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._ensure(1)
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, length: int) -> int:
        if length == 0:
            return 0
        if self.n < length:
            self._ensure(length)
        self.n -= length
        return (self.acc >> self.n) & ((1 << length) - 1)

    def read_symbol(self, table) -> int:
        if self.n < 16:
            try:
                self._ensure(16)
            except ValueError:
                if self.n == 0:
                    raise
        n = self.n
        if n >= 16:
            peek = (self.acc >> (n - 16)) & 0xFFFF
            length = table.lut_len[peek]
            if length == 0:
                raise ValueError("JPEG: invalid Huffman code in scan")
        else:
            # tail of a strict segment: pad the lookahead with 1s —
            # canonical-prefix LUTs only depend on the first `length`
            # bits, so the fill never changes a within-range decode
            pad = 16 - n
            peek = ((self.acc & ((1 << n) - 1)) << pad) | ((1 << pad) - 1)
            length = table.lut_len[peek]
            if length == 0:
                raise ValueError("JPEG: invalid Huffman code in scan")
            if length > n:
                raise ValueError("JPEG: entropy stream exhausted")
        self.n -= length
        return table.lut_sym[peek]

    def expect_restart(self, idx: int) -> None:
        """Discard the pad bits of the current segment and step to the
        one behind the expected RSTn marker (T.81 F.2.1.3.1: restart
        markers are byte-aligned and cycle D0..D7). The decoder must
        have consumed the segment exactly: at a restart boundary only
        the final byte's pad bits (< 8) may remain — a whole unread
        byte means the entropy decode terminated early (corruption),
        which the pre-split reader must surface, not silently resync
        past (the old reader's marker-position check)."""
        left = self.n + 8 * (self.nbytes - self.bytepos)
        if left >= 8:
            raise ValueError(
                f"JPEG: expected restart marker RST{idx & 7}, got "
                f"{left} bits of unread entropy data before it"
            )
        got = self.seg_rsts[self.si]
        if got is None:
            raise ValueError(
                f"JPEG: expected restart marker RST{idx & 7}, "
                "got end of scan"
            )
        if got != (idx & 7):
            raise ValueError(
                f"JPEG: expected restart marker RST{idx & 7}, got RST{got}"
            )
        self.si += 1
        self._load(self.si)


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` raw bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _size_cat(v: int) -> int:
    size = 0
    a = abs(v)
    while a:
        a >>= 1
        size += 1
    return size


def _fdct_quant(block, quant) -> list[int]:
    """Float FDCT of one level-shifted 8x8 block + quantization,
    zigzag order out. Constant blocks short-circuit (AC exactly
    zero, DC in closed form) — the counterpart of the decoder's
    DC-only fast path."""
    first = block[0][0]
    if all(v == first for row in block for v in row):
        out = [0] * 64
        out[0] = int(round((first - 128) * 8 / quant[0]))
        return out
    coef = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        (block[x][y] - 128)
                        * _COS[x][u]
                        * _COS[y][v]
                    )
            coef[u][v] = 0.25 * _C[u] * _C[v] * s
    out = []
    for i in range(64):
        r, c = divmod(ZIGZAG[i], 8)
        out.append(int(round(coef[r][c] / quant[ZIGZAG[i]])))
    return out


def _idct_block(zz, quant) -> list[list[int]]:
    """Dezigzag + dequant + float 2-D IDCT + level shift + clamp.

    DC-only blocks short-circuit to the constant the full transform
    would produce (the standard decoder fast path — mathematically
    identical: every AC basis function integrates to zero over the
    block); blocks with AC energy run the direct-form float sum,
    bit-matched by the fuzz suite against an independent direct-form
    reference decoder (a separable refactor would regroup the float
    additions and drift at round-to-integer boundaries)."""
    if not any(zz[1:]):
        val = int(round(zz[0] * quant[0] / 8)) + 128
        val = max(0, min(255, val))
        return [[val] * 8 for _ in range(8)]
    coef = [[0.0] * 8 for _ in range(8)]
    for i in range(64):
        r, c = divmod(ZIGZAG[i], 8)
        coef[r][c] = zz[i] * quant[ZIGZAG[i]]
    out = []
    for x in range(8):
        row = []
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        _C[u] * _C[v] * coef[u][v]
                        * _COS[x][u] * _COS[y][v]
                    )
            val = int(round(s / 4)) + 128
            row.append(max(0, min(255, val)))
        out.append(row)
    return out


def encode_jpeg_gray(pixels, quant=STD_QUANT, restart_interval=0) -> bytes:
    """Encode a grayscale image (list of rows, 0-255) as a baseline
    JFIF JPEG: float FDCT, Annex-K quantization + Huffman tables,
    differential DC, run-length AC with EOB/ZRL, byte stuffing;
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (DC predictors reset)."""
    h = len(pixels)
    w = len(pixels[0])
    bh = (h + 7) // 8
    bw = (w + 7) // 8
    dc_codes = _build_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_codes(STD_AC_BITS, STD_AC_VALS)
    writer = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    zzs = _plane_zz_blocks(pixels, h, w, quant)
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart(rst)
                rst = (rst + 1) & 7
                prev_dc = 0
            mcu += 1
            zz = zzs[by][bx]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size = _size_cat(diff)
            code, length = dc_codes[size]
            writer.write(code, length)
            if size:
                writer.write(diff if diff >= 0 else diff - 1 + (1 << size),
                             size)
            run = 0
            last_nz = 0
            for i in range(1, 64):
                if zz[i]:
                    last_nz = i
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    writer.write(code, length)
                    run -= 16
                size = _size_cat(zz[i])
                code, length = ac_codes[(run << 4) | size]
                writer.write(code, length)
                v = zz[i]
                writer.write(v if v >= 0 else v - 1 + (1 << size), size)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                writer.write(code, length)
    scan = writer.flush()

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) \
            + payload

    dqt = seg(0xDB, bytes([0]) + bytes(quant[ZIGZAG[i]] for i in range(64)))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes((1, 0x11, 0)))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(STD_DC_BITS)
                 + bytes(STD_DC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(STD_AC_BITS)
                 + bytes(STD_AC_VALS))
    sos = seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
               + bytes((0, 0)))
    return (b"\xff\xd8" + app0 + dqt + dri + sof + dht_dc + dht_ac + sos
            + scan + b"\xff\xd9")


def _decode_one_block(reader, dc_table, ac_table, prev_dc: int):
    """Entropy-decode one 8x8 block (zigzag coefficients) and return
    (zz, new_dc_predictor)."""
    zz = [0] * 64
    size = reader.read_symbol(dc_table)
    if size > 11:
        raise ValueError("JPEG: DC size category out of range")
    prev_dc += _extend(reader.read_bits(size), size)
    zz[0] = prev_dc
    i = 1
    while i < 64:
        rs = reader.read_symbol(ac_table)
        run, size = rs >> 4, rs & 0x0F
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            i += 16
            continue
        i += run
        if i > 63:
            raise ValueError("JPEG: AC run past block end")
        zz[i] = _extend(reader.read_bits(size), size)
        i += 1
    return zz, prev_dc


def _clamp8(x: float) -> int:
    # floor(x + 0.5): deterministic half-up (NOT python banker's
    # round), the same expression the SQL oracles replay
    return max(0, min(255, math.floor(x + 0.5)))


def _encode_plane_blocks(writer, plane, h, w, quant, dc_codes, ac_codes,
                         prev_dc, bx, by, zz=None):
    """FDCT + entropy-encode the (bx, by) block of one plane; returns
    the new DC predictor. ``zz`` short-circuits the per-block
    extraction + FDCT when the caller batched the whole plane through
    ``_plane_zz_blocks`` (identical coefficients by construction)."""
    if zz is None:
        block = [
            [
                plane[min(by * 8 + x, h - 1)][min(bx * 8 + y, w - 1)]
                for y in range(8)
            ]
            for x in range(8)
        ]
        zz = _fdct_quant(block, quant)
    diff = zz[0] - prev_dc
    size = _size_cat(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff - 1 + (1 << size), size)
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i]:
            last_nz = i
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        size = _size_cat(zz[i])
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        v = zz[i]
        writer.write(v if v >= 0 else v - 1 + (1 << size), size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return zz[0]


def encode_jpeg_ycbcr(
    y_plane, cb_plane, cr_plane, quant_y=STD_QUANT, quant_c=STD_QUANT_C,
    restart_interval=0,
) -> bytes:
    """Encode three full-resolution planes as a baseline 4:4:4 YCbCr
    JPEG (one block per component per MCU, separate DC predictors,
    luma/chroma quant tables, shared Annex-K Huffman tables)."""
    h = len(y_plane)
    w = len(y_plane[0])
    dc_codes = _build_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_codes(STD_AC_BITS, STD_AC_VALS)
    writer = _BitWriter()
    prev = [0, 0, 0]
    planes = (y_plane, cb_plane, cr_plane)
    quants = (quant_y, quant_c, quant_c)
    zz_all = [_plane_zz_blocks(planes[c], h, w, quants[c]) for c in range(3)]
    mcu = 0
    rst = 0
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.restart(rst)
                rst = (rst + 1) & 7
                prev = [0, 0, 0]
            mcu += 1
            for c in range(3):
                prev[c] = _encode_plane_blocks(
                    writer, planes[c], h, w, quants[c],
                    dc_codes, ac_codes, prev[c], bx, by,
                    zz=zz_all[c][by][bx],
                )
    scan = writer.flush()

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) \
            + payload

    dqt = seg(0xDB, bytes([0]) + bytes(quant_y[ZIGZAG[i]] for i in range(64))
              + bytes([1]) + bytes(quant_c[ZIGZAG[i]] for i in range(64)))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes((1, 0x11, 0)) + bytes((2, 0x11, 1))
              + bytes((3, 0x11, 1)))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(STD_DC_BITS)
                 + bytes(STD_DC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(STD_AC_BITS)
                 + bytes(STD_AC_VALS))
    sos = seg(0xDA, bytes((3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
               + bytes((0, 0)))
    return (b"\xff\xd8" + app0 + dqt + dri + sof + dht_dc + dht_ac + sos
            + scan + b"\xff\xd9")


def encode_jpeg_ycbcr_420(
    y_plane, cb_plane, cr_plane, quant_y=STD_QUANT, quant_c=STD_QUANT_C
) -> bytes:
    """Encode a 4:2:0 baseline JPEG: full-resolution luma, HALF-
    resolution chroma planes (ceil(h/2) x ceil(w/2)); each MCU is
    four 2x2 raster-ordered Y blocks + one Cb + one Cr."""
    h = len(y_plane)
    w = len(y_plane[0])
    ch = (h + 1) // 2
    cw = (w + 1) // 2
    if len(cb_plane) != ch or len(cb_plane[0]) != cw:
        raise ValueError("4:2:0 chroma planes must be half-resolution")
    dc_codes = _build_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_codes(STD_AC_BITS, STD_AC_VALS)
    writer = _BitWriter()
    prev = [0, 0, 0]
    mcus_y = (h + 15) // 16
    mcus_x = (w + 15) // 16
    # luma blocks run to the MCU grid (2*mcus per axis), which may
    # exceed ceil(dim/8): _plane_zz_blocks edge-replicates the pad
    # blocks exactly like the old per-block min() clamp
    zz_y = _plane_zz_blocks(
        y_plane, h, w, quant_y, bw=2 * mcus_x, bh=2 * mcus_y
    )
    zz_cb = _plane_zz_blocks(
        cb_plane, ch, cw, quant_c, bw=mcus_x, bh=mcus_y
    )
    zz_cr = _plane_zz_blocks(
        cr_plane, ch, cw, quant_c, bw=mcus_x, bh=mcus_y
    )
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for byi in range(2):
                for bxi in range(2):
                    prev[0] = _encode_plane_blocks(
                        writer, y_plane, h, w, quant_y,
                        dc_codes, ac_codes, prev[0],
                        mx * 2 + bxi, my * 2 + byi,
                        zz=zz_y[my * 2 + byi][mx * 2 + bxi],
                    )
            prev[1] = _encode_plane_blocks(
                writer, cb_plane, ch, cw, quant_c,
                dc_codes, ac_codes, prev[1], mx, my,
                zz=zz_cb[my][mx],
            )
            prev[2] = _encode_plane_blocks(
                writer, cr_plane, ch, cw, quant_c,
                dc_codes, ac_codes, prev[2], mx, my,
                zz=zz_cr[my][mx],
            )
    scan = writer.flush()

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) \
            + payload

    dqt = seg(0xDB, bytes([0]) + bytes(quant_y[ZIGZAG[i]] for i in range(64))
              + bytes([1]) + bytes(quant_c[ZIGZAG[i]] for i in range(64)))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes((1, 0x22, 0)) + bytes((2, 0x11, 1))
              + bytes((3, 0x11, 1)))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(STD_DC_BITS)
                 + bytes(STD_DC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(STD_AC_BITS)
                 + bytes(STD_AC_VALS))
    sos = seg(0xDA, bytes((3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
               + bytes((0, 0)))
    return (b"\xff\xd8" + app0 + dqt + sof + dht_dc + dht_ac + sos
            + scan + b"\xff\xd9")


def encode_jpeg_color(rgb) -> bytes:
    """RGB rows of (r, g, b) -> 4:4:4 JPEG via the JFIF forward
    conversion with half-up rounding. Vectorized (r12): numpy float64
    runs the SAME left-associated IEEE-double expression elementwise
    as the scalar loop did, and floor(x + 0.5) + clip is _clamp8
    verbatim — bit-identical planes."""
    a = np.asarray(rgb, dtype=np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]

    def clamp8(x):
        return np.clip(np.floor(x + 0.5), 0, 255).astype(np.int32)

    yp = clamp8(0.299 * r + 0.587 * g + 0.114 * b)
    cbp = clamp8(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    crp = clamp8(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    return encode_jpeg_ycbcr(yp, cbp, crp)


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG: grayscale (1 component) or 4:4:4 YCbCr
    color (3 components, no subsampling). Returns {width, height,
    ncomp, pixels} for grayscale or {width, height, ncomp, rgb} for
    color, rows trimmed to the declared dimensions; ``rgb`` rows hold
    (r, g, b) tuples via the JFIF conversion with half-up rounding."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant = {}
    dc_tables = {}
    ac_tables = {}
    w = h = None
    components = []  # (id, tq, hs, vs)
    scan_spec = None
    scan_at = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip the run so payload[pos + 1] is the id byte
        # (r9 advisor finding: a fill-padded file had the 0xFF fill
        # misread as the marker id and seg_len parsed from garbage)
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        # the skip loop may consume the tail of the payload; keep the
        # module's ValueError contract for malformed input instead of
        # letting payload[pos + 1] raise IndexError
        if pos + 2 > len(payload):
            raise ValueError("JPEG: truncated fill-byte run")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if pos + 4 > len(payload):
            raise ValueError("JPEG: truncated segment header")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = body[i + 1 : i + 65]
                raster = [0] * 64
                for k in range(64):
                    raster[ZIGZAG[k]] = zz[k]
                quant[tq] = raster
                i += 65
        elif marker == 0xC0:
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("8-bit baseline only")
            if ncomp not in (1, 3):
                raise NotImplementedError("1 or 3 components only")
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = sampling >> 4, sampling & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        "sampling factors 1 or 2 only"
                    )
                components.append((cid, tq, hs, vs))
            hmax = max(c[2] for c in components)
            vmax = max(c[3] for c in components)
            if ncomp == 1 and (hmax, vmax) != (1, 1):
                raise NotImplementedError("grayscale must be 1x1")
        elif marker == 0xC2:
            # progressive DCT (Huffman): multi-scan coefficient decode
            return _decode_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: baseline sequential or "
                "Huffman progressive only"
            )
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = tuple(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + nvals])
                if len(bits) < 16 or len(vals) < nvals:
                    raise ValueError("JPEG: truncated DHT segment")
                table = _build_decode_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                i += 17 + nvals
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(components):
                raise NotImplementedError("scan must cover all components")
            scan_spec = []
            for c in range(ns):
                scan_spec.append((body[2 + 2 * c] >> 4,
                                  body[2 + 2 * c] & 0x0F))
            scan_at = pos + 2 + seg_len
            break
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        pos += 2 + seg_len
    if scan_at is None or w is None:
        raise ValueError("JPEG: missing SOS/SOF0")
    for comp in components:
        if comp[1] not in quant:
            raise ValueError("JPEG: component references missing quant table")
    for td, ta in scan_spec:
        if td not in dc_tables or ta not in ac_tables:
            raise ValueError("JPEG: scan references missing Huffman table")
    reader = _BitReader(payload[scan_at:])
    ncomp = len(components)
    # MCU geometry (T.81 A.2.3): an MCU spans 8*hmax x 8*vmax pixels
    # and carries h_i*v_i blocks of component i, raster order within
    # the MCU; each component's plane is stored at its OWN resolution
    # ceil(dim * f_i / fmax), padded to whole blocks
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for cid, tq, hs, vs in components:
        planes.append(
            [[0] * (mcus_x * 8 * hs) for _ in range(mcus_y * 8 * vs)]
        )
    prev_dc = [0] * ncomp
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # byte-align, consume RSTn (cycling D0..D7), reset the
                # DC predictors — T.81 F.2.1.3.1
                reader.expect_restart(rst_idx)
                rst_idx = (rst_idx + 1) & 7
                prev_dc = [0] * ncomp
            mcu_count += 1
            for c, (cid, tq, hs, vs) in enumerate(components):
                td, ta = scan_spec[c]
                for byi in range(vs):
                    for bxi in range(hs):
                        zz, prev_dc[c] = _decode_one_block(
                            reader, dc_tables[td], ac_tables[ta],
                            prev_dc[c],
                        )
                        block = _idct_block(zz, quant[tq])
                        ox = my * 8 * vs + byi * 8
                        oy = mx * 8 * hs + bxi * 8
                        for x in range(8):
                            planes[c][ox + x][oy : oy + 8] = block[x]
    return _assemble_output(components, planes, w, h, hmax, vmax)


def _assemble_output(components, planes, w, h, hmax, vmax) -> dict:
    """Decoded component planes -> the output dict (grayscale trim or
    nearest-neighbour chroma upsample + JFIF YCbCr->RGB)."""
    if len(components) == 1:
        return {
            "width": w, "height": h, "ncomp": 1,
            "pixels": [row[:w] for row in planes[0][:h]],
        }
    # upsample subsampled planes by nearest (pixel (x, y) reads
    # component sample (x * v_i // vmax, y * h_i // hmax)).
    # Vectorized (r12): the nearest-index gather and the JFIF
    # conversion run elementwise in float64 with the same
    # left-associated expressions as the scalar loop, and
    # floor(x + 0.5) + clip is _clamp8 verbatim — bit-identical.
    xs = np.arange(h)
    ys = np.arange(w)
    chans = []
    for ci in range(3):
        arr = np.asarray(planes[ci], dtype=np.float64)
        chans.append(
            arr[np.ix_(xs * components[ci][3] // vmax,
                       ys * components[ci][2] // hmax)]
        )
    Y, cb, cr = chans[0], chans[1] - 128.0, chans[2] - 128.0

    def clamp8(x):
        return np.clip(np.floor(x + 0.5), 0, 255).astype(np.int64)

    px = np.stack(
        [
            clamp8(Y + 1.402 * cr),
            clamp8(Y - 0.344136 * cb - 0.714136 * cr),
            clamp8(Y + 1.772 * cb),
        ],
        axis=-1,
    ).tolist()
    rgb = [list(map(tuple, row)) for row in px]
    return {"width": w, "height": h, "ncomp": 3, "rgb": rgb}


def decode_jpeg_gray(payload: bytes) -> dict:
    """Decode a baseline grayscale JPEG: returns {width, height,
    pixels} (the padded block edge trimmed to the declared
    dimensions). Color payloads decode via ``decode_jpeg``."""
    out = decode_jpeg(payload)
    if out["ncomp"] != 1:
        raise ValueError("JPEG: expected grayscale, got color")
    return out


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2, Huffman) — T.81 Annex G
# ---------------------------------------------------------------------------

# AC Huffman table used by the PROGRESSIVE encoder: the Annex-K AC
# table has no EOBn symbols (0x10..0xE0), which progressive AC scans
# need for EOB runs > 1. Canonical 256-symbol table, 254 codes of
# length 8 + 2 of length 9 (Kraft 254/256 + 2/512 < 1 — incomplete
# codes are legal per T.81 C.2); poor compression, full symbol space.
PROG_AC_BITS = (0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0)
PROG_AC_VALS = tuple(range(256))


def _find_entropy_end(payload: bytes, start: int) -> int:
    """First position >= start where the entropy-coded data ends: a
    0xFF followed by anything but 0x00 stuffing or RST0-7. A 0xFF 0xFF
    pair means optional fill bytes pad the next marker (T.81 B.1.1.2)
    — the returned position is the FIRST fill byte (the true entropy
    boundary, so the scan slice excludes padding); the segment walk
    skips the remainder of the run before reading the marker id."""
    pos = start
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00,) and not (
            0xD0 <= payload[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1 + (1 if payload[pos] == 0xFF else 0)
    return n


class _ScanState:
    """Cross-block progressive scan state: EOB run + DC predictors."""

    def __init__(self, ncomp: int):
        self.eobrun = 0
        self.prev_dc = [0] * ncomp

    def reset_restart(self) -> None:
        self.eobrun = 0
        self.prev_dc = [0] * len(self.prev_dc)


def _prog_dc_first(reader, dc_table, coef, state, ci, al) -> None:
    size = reader.read_symbol(dc_table)
    if size > 11:
        raise ValueError("JPEG: DC size category out of range")
    state.prev_dc[ci] += _extend(reader.read_bits(size), size)
    coef[0] = state.prev_dc[ci] << al


def _prog_dc_refine(reader, coef, al) -> None:
    if reader.read_bit():
        coef[0] |= 1 << al


def _prog_ac_first(reader, ac_table, coef, state, ss, se, al) -> None:
    """T.81 G.2 / figure G.3: first AC scan of a band — run/size
    symbols with EOBn run-length codes."""
    if state.eobrun > 0:
        state.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG: progressive AC run past band end")
            coef[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        else:
            if r != 15:
                state.eobrun = (1 << r) - 1
                if r:
                    state.eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL


def _prog_ac_refine(reader, ac_table, coef, state, ss, se, al) -> None:
    """T.81 G.2 / figure G.7: AC refinement — every already-nonzero
    coefficient crossed consumes one correction bit; run counts cover
    still-zero positions only; EOB runs refine the band tail."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state.eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_table)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError(
                        "JPEG: refinement scan coded size != 1"
                    )
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    state.eobrun = 1 << r
                    if r:
                        state.eobrun += reader.read_bits(r)
                    break
            while k <= se:
                c = coef[k]
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if state.eobrun > 0:
        while k <= se:
            c = coef[k]
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        state.eobrun -= 1


def _decode_progressive(payload: bytes) -> dict:
    """Decode a Huffman progressive JPEG (SOF2): every scan refines a
    persistent per-component coefficient store (T.81 G.2 decode
    control); tables may be redefined between scans; after EOI the
    accumulated coefficients IDCT exactly like a baseline image.

    Scan rules enforced: a DC scan has Ss=Se=0 and may be interleaved;
    an AC scan covers a single component (T.81 B.2.3); first scans
    have Ah=0, refinements Ah>0.
    """
    pos = 2
    quant = {}
    dc_tables = {}
    ac_tables = {}
    w = h = None
    components = []
    restart_interval = 0
    coefs = None  # per component: [by][bx] -> 64-list (zigzag order)
    comp_blocks = None  # per component: (blocks_w, blocks_h)
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip the run so payload[pos + 1] is the id byte
        # (r9 advisor finding: a fill-padded file had the 0xFF fill
        # misread as the marker id and seg_len parsed from garbage)
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        # the skip loop may consume the tail of the payload; keep the
        # module's ValueError contract for malformed input instead of
        # letting payload[pos + 1] raise IndexError
        if pos + 2 > len(payload):
            raise ValueError("JPEG: truncated fill-byte run")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if pos + 4 > len(payload):
            raise ValueError("JPEG: truncated segment header")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = body[i + 1 : i + 65]
                raster = [0] * 64
                for k in range(64):
                    raster[ZIGZAG[k]] = zz[k]
                quant[tq] = raster
                i += 65
        elif marker == 0xC2:
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("8-bit only")
            if ncomp not in (1, 3):
                raise NotImplementedError("1 or 3 components only")
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = sampling >> 4, sampling & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError("sampling factors 1 or 2 only")
                components.append((cid, tq, hs, vs))
            hmax = max(c[2] for c in components)
            vmax = max(c[3] for c in components)
            if ncomp == 1 and (hmax, vmax) != (1, 1):
                raise NotImplementedError("grayscale must be 1x1")
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = []
            comp_blocks = []
            for cid, tq, hs, vs in components:
                cw = (w * hs + hmax - 1) // hmax
                ch = (h * vs + vmax - 1) // vmax
                bw = (cw + 7) // 8
                bh = (ch + 7) // 8
                comp_blocks.append((bw, bh))
                # allocate at the interleaved-MCU coverage (>= bw/bh):
                # interleaved DC scans touch the padding blocks too
                coefs.append(
                    [
                        [[0] * 64 for _ in range(mcus_x * hs)]
                        for _ in range(mcus_y * vs)
                    ]
                )
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = tuple(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + nvals])
                if len(bits) < 16 or len(vals) < nvals:
                    raise ValueError("JPEG: truncated DHT segment")
                table = _build_decode_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                i += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG: second SOF inside progressive frame")
        elif marker == 0xDA:
            if coefs is None:
                raise ValueError("JPEG: SOS before SOF2")
            ns = body[0]
            scan_comps = []  # (component index, td, ta)
            for c in range(ns):
                cs = body[1 + 2 * c]
                td = body[2 + 2 * c] >> 4
                ta = body[2 + 2 * c] & 0x0F
                idx = next(
                    (i for i, comp in enumerate(components) if comp[0] == cs),
                    None,
                )
                if idx is None:
                    raise ValueError("JPEG: scan references unknown component")
                scan_comps.append((idx, td, ta))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if ss == 0 and se != 0:
                raise ValueError("JPEG: DC scan must have Se=0")
            if ss > 0 and ns != 1:
                raise ValueError("JPEG: AC scans are single-component")
            if se > 63 or ss > se:
                raise ValueError("JPEG: bad spectral selection")
            scan_start = pos + 2 + seg_len
            scan_end = _find_entropy_end(payload, scan_start)
            reader = _BitReader(payload[scan_start:scan_end])
            _decode_progressive_scan(
                reader, components, comp_blocks, coefs, scan_comps,
                ss, se, ah, al, dc_tables, ac_tables,
                restart_interval, mcus_x, mcus_y,
            )
            pos = scan_end
            continue
        pos += 2 + seg_len
    if coefs is None or w is None:
        raise ValueError("JPEG: missing SOF2/SOS")
    planes = []
    for ci, (cid, tq, hs, vs) in enumerate(components):
        if tq not in quant:
            raise ValueError("JPEG: component references missing quant table")
        bw, bh = comp_blocks[ci]
        plane = [[0] * (mcus_x * 8 * hs) for _ in range(mcus_y * 8 * vs)]
        for by in range(bh):
            for bx in range(bw):
                block = _idct_block(coefs[ci][by][bx], quant[tq])
                for x in range(8):
                    plane[by * 8 + x][bx * 8 : bx * 8 + 8] = block[x]
        planes.append(plane)
    return _assemble_output(components, planes, w, h, hmax, vmax)


def _decode_progressive_scan(
    reader, components, comp_blocks, coefs, scan_comps,
    ss, se, ah, al, dc_tables, ac_tables,
    restart_interval, mcus_x, mcus_y,
) -> None:
    """One progressive scan over the coefficient store. Restart
    markers byte-align, reset the DC predictors AND the EOB run, and
    cycle RST0-7 from 0 within each scan."""
    state = _ScanState(len(components))
    rst_idx = 0
    unit = 0  # MCUs (interleaved) or blocks (single-component)

    def maybe_restart():
        nonlocal rst_idx
        if restart_interval and unit and unit % restart_interval == 0:
            reader.expect_restart(rst_idx)
            rst_idx = (rst_idx + 1) & 7
            state.reset_restart()

    if len(scan_comps) > 1 or (
        ss == 0 and len(components) > 1 and len(scan_comps) == len(components)
    ):
        # interleaved DC scan: full MCU geometry
        for ci, td, ta in scan_comps:
            if ah == 0 and td not in dc_tables:
                raise ValueError("JPEG: scan references missing DC table")
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                unit += 1
                for ci, td, ta in scan_comps:
                    cid, tq, hs, vs = components[ci]
                    for byi in range(vs):
                        for bxi in range(hs):
                            coef = coefs[ci][my * vs + byi][mx * hs + bxi]
                            if ah == 0:
                                _prog_dc_first(
                                    reader, dc_tables[td], coef, state, ci, al
                                )
                            else:
                                _prog_dc_refine(reader, coef, al)
        return
    # single-component scan: the component's own block grid
    ci, td, ta = scan_comps[0]
    bw, bh = comp_blocks[ci]
    if ss == 0 and ah == 0 and td not in dc_tables:
        raise ValueError("JPEG: scan references missing DC table")
    if ss > 0 and ta not in ac_tables:
        raise ValueError("JPEG: scan references missing AC table")
    for by in range(bh):
        for bx in range(bw):
            maybe_restart()
            unit += 1
            coef = coefs[ci][by][bx]
            if ss == 0:
                if ah == 0:
                    _prog_dc_first(reader, dc_tables[td], coef, state, ci, al)
                else:
                    _prog_dc_refine(reader, coef, al)
            elif ah == 0:
                _prog_ac_first(
                    reader, ac_tables[ta], coef, state, ss, se, al
                )
            else:
                _prog_ac_refine(
                    reader, ac_tables[ta], coef, state, ss, se, al
                )


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 G.1.2) — the fuzz twin of the decoder
# ---------------------------------------------------------------------------


class _EncState:
    def __init__(self):
        self.eobrun = 0
        self.pending = []  # correction bits buffered behind the EOB run


def _enc_flush_eobrun(writer, st: _EncState, ac_codes) -> None:
    """Emit the pending EOBn symbol (nbits = floor(log2(run)), low
    bits follow) and any correction bits buffered behind it."""
    if st.eobrun > 0:
        nbits = st.eobrun.bit_length() - 1
        code, length = ac_codes[nbits << 4]
        writer.write(code, length)
        if nbits:
            writer.write(st.eobrun & ((1 << nbits) - 1), nbits)
        st.eobrun = 0
    for b in st.pending:
        writer.write(b, 1)
    st.pending = []


def _enc_dc_first(writer, zz, prev: int, al, dc_codes) -> int:
    """Differential DC of the point-transformed value (arithmetic
    shift right — exact for negatives under the OR-bit refinement).
    Returns the new predictor (shifted domain)."""
    v = zz[0] >> al
    diff = v - prev
    size = _size_cat(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff - 1 + (1 << size), size)
    return v


def _enc_dc_refine(writer, zz, al) -> None:
    writer.write((zz[0] >> al) & 1, 1)


def _enc_ac_first(writer, st: _EncState, zz, ss, se, al, ac_codes) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = zz[k]
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        _enc_flush_eobrun(writer, st, ac_codes)
        while r > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            r -= 16
        s = _size_cat(t)
        code, length = ac_codes[(r << 4) | s]
        writer.write(code, length)
        tv = t if v >= 0 else -t
        writer.write(tv if tv >= 0 else tv - 1 + (1 << s), s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _enc_flush_eobrun(writer, st, ac_codes)


def _enc_ac_refine(writer, st: _EncState, zz, ss, se, al, ac_codes) -> None:
    """T.81 G.1.2.3 / figure G.7: newly-significant coefficients code
    (run, 1) + sign; already-significant ones buffer one correction
    bit that rides the NEXT emitted symbol (or the EOB run)."""
    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eob_k = ss - 1  # last newly-significant position
    for i, k in enumerate(range(ss, se + 1)):
        if absv[i] == 1:
            eob_k = k
    r = 0
    br = []  # correction bits since the last emitted symbol
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            _enc_flush_eobrun(writer, st, ac_codes)
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _enc_flush_eobrun(writer, st, ac_codes)
        code, length = ac_codes[(r << 4) | 1]
        writer.write(code, length)
        writer.write(1 if zz[k] >= 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            _enc_flush_eobrun(writer, st, ac_codes)


def _plane_zz_blocks(plane, h, w, quant, bw=None, bh=None):
    """FDCT+quantize every 8x8 block of a plane (edge-replicated).
    ``bw``/``bh`` may exceed the ceil(dim/8) grid to cover interleaved
    -MCU padding blocks (edge replication extends them too).

    Vectorized (r12): the plane is edge-padded once and every block's
    constant-ness is checked in a single numpy pass — constant blocks
    (the synthetic corpora's norm) take the same closed-form DC
    short-circuit ``_fdct_quant`` documents; blocks with AC energy
    fall back to the scalar float FDCT so the summation ORDER (and
    thus round-to-integer) stays bit-identical to the direct-form
    reference loop."""
    bh = bh if bh is not None else (h + 7) // 8
    bw = bw if bw is not None else (w + 7) // 8
    arr = np.asarray(plane, dtype=np.int32)[:h, :w]
    arr = np.pad(arr, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    flat = (
        arr.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 64)
    )
    const = (flat == flat[:, :1]).all(axis=1)
    q0 = quant[0]
    out = []
    for by in range(bh):
        row = []
        for bx in range(bw):
            i = by * bw + bx
            if const[i]:
                zz = [0] * 64
                zz[0] = int(round((int(flat[i, 0]) - 128) * 8 / q0))
                row.append(zz)
            else:
                row.append(
                    _fdct_quant(flat[i].reshape(8, 8).tolist(), quant)
                )
        out.append(row)
    return out


def _prog_headers(h, w, comps, quants, restart_interval):
    """SOI..DHT prefix shared by the progressive encoders. ``comps``:
    (cid, sampling_byte, tq) triples; ``quants``: tq -> raster table."""

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) \
            + payload

    dqt = b""
    for tq in sorted(quants):
        dqt += seg(
            0xDB,
            bytes([tq]) + bytes(quants[tq][ZIGZAG[i]] for i in range(64)),
        )
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sof = seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, len(comps))
        + b"".join(bytes(c) for c in comps),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(STD_DC_BITS) + bytes(STD_DC_VALS))
    dht += seg(0xC4, bytes([0x10]) + bytes(PROG_AC_BITS)
               + bytes(PROG_AC_VALS))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1)
               + bytes((0, 0)))
    return b"\xff\xd8" + app0 + dqt + dri + sof + dht


def _sos(scan_comps, ss, se, ah, al) -> bytes:
    """SOS header: ``scan_comps`` = (component id, td, ta) triples."""
    body = bytes([len(scan_comps)])
    for cid, td, ta in scan_comps:
        body += bytes((cid, (td << 4) | ta))
    body += bytes((ss, se, (ah << 4) | al))
    return bytes((0xFF, 0xDA)) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_gray_progressive(
    pixels, quant=STD_QUANT, restart_interval=0
) -> bytes:
    """Progressive grayscale encoder: DC first (Al=1) -> two AC bands
    first (Al=2) -> two full-band AC refinements (Al 2->1->0) -> DC
    refinement. Successive approximation is lossless once every
    refinement lands, so the decoded image equals the baseline decode
    of the same quantized coefficients — the differential fuzz
    contract. ``restart_interval`` > 0 emits RSTn every that many
    blocks in EVERY scan (EOB runs and DC predictors reset)."""
    h = len(pixels)
    w = len(pixels[0])
    blocks = _plane_zz_blocks(pixels, h, w, quant)
    dc_codes = _build_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_codes(PROG_AC_BITS, PROG_AC_VALS)
    out = bytearray(_prog_headers(h, w, [(1, 0x11, 0)],
                                  {0: quant}, restart_interval))

    def dc_scan(ah, al):
        writer = _BitWriter()
        prev = 0
        unit = 0
        rst = 0
        for row in blocks:
            for zz in row:
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    writer.restart(rst)
                    rst = (rst + 1) & 7
                    prev = 0
                unit += 1
                if ah == 0:
                    prev = _enc_dc_first(writer, zz, prev, al, dc_codes)
                else:
                    _enc_dc_refine(writer, zz, al)
        return writer.flush()

    def ac_scan(ss, se, ah, al):
        writer = _BitWriter()
        st = _EncState()
        unit = 0
        rst = 0
        for row in blocks:
            for zz in row:
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    _enc_flush_eobrun(writer, st, ac_codes)
                    writer.restart(rst)
                    rst = (rst + 1) & 7
                unit += 1
                if ah == 0:
                    _enc_ac_first(writer, st, zz, ss, se, al, ac_codes)
                else:
                    _enc_ac_refine(writer, st, zz, ss, se, al, ac_codes)
        _enc_flush_eobrun(writer, st, ac_codes)
        return writer.flush()

    out += _sos([(1, 0, 0)], 0, 0, 0, 1) + dc_scan(0, 1)
    out += _sos([(1, 0, 0)], 1, 5, 0, 2) + ac_scan(1, 5, 0, 2)
    out += _sos([(1, 0, 0)], 6, 63, 0, 2) + ac_scan(6, 63, 0, 2)
    out += _sos([(1, 0, 0)], 1, 63, 2, 1) + ac_scan(1, 63, 2, 1)
    out += _sos([(1, 0, 0)], 1, 63, 1, 0) + ac_scan(1, 63, 1, 0)
    out += _sos([(1, 0, 0)], 0, 0, 1, 0) + dc_scan(1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_ycbcr_progressive(
    y_plane, cb_plane, cr_plane,
    quant_y=STD_QUANT, quant_c=STD_QUANT_C, restart_interval=0,
) -> bytes:
    """Progressive 4:4:4 color encoder: one INTERLEAVED DC first scan
    (all three components per MCU, separate predictors), per-component
    AC first (Al=1) and AC refinement (Al=0) scans, then the DC
    refinement scan — the standard multi-scan shape real progressive
    encoders emit."""
    h = len(y_plane)
    w = len(y_plane[0])
    planes = (y_plane, cb_plane, cr_plane)
    quants = (quant_y, quant_c, quant_c)
    blocks = [_plane_zz_blocks(planes[c], h, w, quants[c]) for c in range(3)]
    dc_codes = _build_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_codes(PROG_AC_BITS, PROG_AC_VALS)
    out = bytearray(
        _prog_headers(
            h, w,
            [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)],
            {0: quant_y, 1: quant_c}, restart_interval,
        )
    )

    def dc_scan(ah, al):
        writer = _BitWriter()
        prev = [0, 0, 0]
        unit = 0
        rst = 0
        for by in range((h + 7) // 8):
            for bx in range((w + 7) // 8):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    writer.restart(rst)
                    rst = (rst + 1) & 7
                    prev = [0, 0, 0]
                unit += 1
                for c in range(3):
                    zz = blocks[c][by][bx]
                    if ah == 0:
                        prev[c] = _enc_dc_first(
                            writer, zz, prev[c], al, dc_codes
                        )
                    else:
                        _enc_dc_refine(writer, zz, al)
        return writer.flush()

    def ac_scan(c, ss, se, ah, al):
        writer = _BitWriter()
        st = _EncState()
        unit = 0
        rst = 0
        for row in blocks[c]:
            for zz in row:
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    _enc_flush_eobrun(writer, st, ac_codes)
                    writer.restart(rst)
                    rst = (rst + 1) & 7
                unit += 1
                if ah == 0:
                    _enc_ac_first(writer, st, zz, ss, se, al, ac_codes)
                else:
                    _enc_ac_refine(writer, st, zz, ss, se, al, ac_codes)
        _enc_flush_eobrun(writer, st, ac_codes)
        return writer.flush()

    ids = (1, 2, 3)
    out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 1) \
        + dc_scan(0, 1)
    for c in range(3):
        out += _sos([(ids[c], 0, 0)], 1, 63, 0, 1) + ac_scan(c, 1, 63, 0, 1)
    for c in range(3):
        out += _sos([(ids[c], 0, 0)], 1, 63, 1, 0) + ac_scan(c, 1, 63, 1, 0)
    out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0) \
        + dc_scan(1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_ycbcr_420_progressive(
    y_plane, cb_plane, cr_plane,
    quant_y=STD_QUANT, quant_c=STD_QUANT_C, restart_interval=0,
) -> bytes:
    """Progressive 4:2:0 encoder — the combination real progressive
    photos actually use (SOF2 + 2x2 chroma subsampling). The
    INTERLEAVED DC scans walk the 16-px MCU grid (four luma blocks +
    one Cb + one Cr per MCU, INCLUDING the edge-padding blocks, whose
    DC diffs are part of the predictor chain exactly as in baseline
    4:2:0); the per-component AC scans walk each component's OWN
    ceil(dim/8) block grid, which excludes padding blocks (T.81
    non-interleaved geometry — the decoder never IDCTs them)."""
    h = len(y_plane)
    w = len(y_plane[0])
    ch = (h + 1) // 2
    cw = (w + 1) // 2
    if len(cb_plane) != ch or len(cb_plane[0]) != cw:
        raise ValueError("4:2:0 chroma planes must be half-resolution")
    mcus_x = (w + 15) // 16
    mcus_y = (h + 15) // 16
    # luma blocks on the PADDED interleaved grid; chroma padded to MCUs
    blocks_y = _plane_zz_blocks(
        y_plane, h, w, quant_y, bw=mcus_x * 2, bh=mcus_y * 2
    )
    blocks_cb = _plane_zz_blocks(
        cb_plane, ch, cw, quant_c, bw=mcus_x, bh=mcus_y
    )
    blocks_cr = _plane_zz_blocks(
        cr_plane, ch, cw, quant_c, bw=mcus_x, bh=mcus_y
    )
    dc_codes = _build_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _build_codes(PROG_AC_BITS, PROG_AC_VALS)
    out = bytearray(
        _prog_headers(
            h, w,
            [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)],
            {0: quant_y, 1: quant_c}, restart_interval,
        )
    )

    def dc_scan(ah, al):
        writer = _BitWriter()
        prev = [0, 0, 0]
        unit = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    writer.restart(rst)
                    rst = (rst + 1) & 7
                    prev = [0, 0, 0]
                unit += 1
                for byi in range(2):
                    for bxi in range(2):
                        zz = blocks_y[my * 2 + byi][mx * 2 + bxi]
                        if ah == 0:
                            prev[0] = _enc_dc_first(
                                writer, zz, prev[0], al, dc_codes
                            )
                        else:
                            _enc_dc_refine(writer, zz, al)
                for c, grid in ((1, blocks_cb), (2, blocks_cr)):
                    zz = grid[my][mx]
                    if ah == 0:
                        prev[c] = _enc_dc_first(
                            writer, zz, prev[c], al, dc_codes
                        )
                    else:
                        _enc_dc_refine(writer, zz, al)
        return writer.flush()

    def ac_scan(grid, bw, bh, ss, se, ah, al):
        writer = _BitWriter()
        st = _EncState()
        unit = 0
        rst = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and \
                        unit % restart_interval == 0:
                    _enc_flush_eobrun(writer, st, ac_codes)
                    writer.restart(rst)
                    rst = (rst + 1) & 7
                unit += 1
                zz = grid[by][bx]
                if ah == 0:
                    _enc_ac_first(writer, st, zz, ss, se, al, ac_codes)
                else:
                    _enc_ac_refine(writer, st, zz, ss, se, al, ac_codes)
        _enc_flush_eobrun(writer, st, ac_codes)
        return writer.flush()

    y_bw, y_bh = (w + 7) // 8, (h + 7) // 8
    c_bw, c_bh = (cw + 7) // 8, (ch + 7) // 8
    comp_grids = (
        (1, blocks_y, y_bw, y_bh),
        (2, blocks_cb, c_bw, c_bh),
        (3, blocks_cr, c_bw, c_bh),
    )
    out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 1) \
        + dc_scan(0, 1)
    for cid, grid, bw, bh in comp_grids:
        out += _sos([(cid, 0, 0)], 1, 63, 0, 1) \
            + ac_scan(grid, bw, bh, 1, 63, 0, 1)
    for cid, grid, bw, bh in comp_grids:
        out += _sos([(cid, 0, 0)], 1, 63, 1, 0) \
            + ac_scan(grid, bw, bh, 1, 63, 1, 0)
    out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0) \
        + dc_scan(1, 0)
    out += b"\xff\xd9"
    return bytes(out)
