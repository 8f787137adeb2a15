"""Baseline JPEG (SOF0) grayscale codec — pure stdlib + numpy.

Third REAL codec modality after WAV (codec.py) and PNG (png.py): a
spec-conformant baseline-DCT JPEG encoder and a full decoder — marker
walk (SOI/DQT/SOF0/DHT/SOS/EOI), canonical Huffman table construction
from DHT, entropy decode with 0xFF00 byte unstuffing, DC differential
EXTEND, AC run-length/EOB, de-zigzag, dequantize, float 8x8 IDCT,
level shift, clamp. No PIL/libjpeg anywhere; the container has no
image libraries, which is exactly why this exists (the reference repo
has no multimodal surface at all — this is north-star scope).

Oracle strategy (mirrors the WAV square-wave and PNG closed-form
tricks): JPEG is lossy, but block-constant images with an even level-
shifted value sit in the codec's LOSSLESS subspace — a constant 8x8
block has only a DC coefficient, F_dc = 8*(v-128); with the uniform
quant table q=16 the quantized value (v-128)/2 is an exact integer a
full 0.5 away from the round-half boundary (float DCT noise of ~1e-12
cannot flip it), and the decoded pixel 2*((v-128)/2) + 128 == v
exactly. So synthesized per-doc images decode bit-exactly to their
generator formula and the WHOLE pipeline — Huffman bits, DC
prediction chain, dequant, real float IDCT — is hash-oracled in SQL.
The lossy path (non-constant blocks, AC coefficients, run-lengths) is
exercised by the encode→decode differential test with the
quantization-error bound in tests/test_jpeg.py.

Scale shape: encode/decode are per-row Python kernels meant to run
under Arrow-batched ``mapInPandas`` (see codec.attach_jpeg_payload /
jpeg_image_stats) — embarrassingly parallel, no shuffle, schema
explicit, the same plumbing contract as every other multimodal op.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- tables

# zigzag scan order: index i of the scan -> (row, col) flat index
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.3 typical luminance Huffman tables (public spec).
# bits[i] = number of codes of length i+1; values = symbols in order.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALUES = list(range(12))

AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALUES = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

DEFAULT_Q = 16  # uniform quant table value (DC and all AC)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward F = C @ B @ C.T,
    inverse B = C.T @ F @ C."""
    C = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            C[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return C


_C = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _canonical_codes(DC_BITS, DC_VALUES)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALUES)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip stuffed zero
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, from a DHT payload."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, t: int) -> int:
    """JPEG signed-amplitude encoding: v>=0 plain, v<0 one's complement."""
    return v if v >= 0 else v + (1 << t) - 1


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ----------------------------------------------------------- encoder

def encode_gray_jpeg(arr: np.ndarray, q: int = DEFAULT_Q) -> bytes:
    """Encode a 2D uint8 array as a baseline grayscale JPEG.

    Uniform quantization table (all 64 entries = ``q``); quantization
    rounds half-up via floor(x + 0.5) in BOTH directions of the number
    line — a deterministic rule the SQL oracle replays exactly.
    Dimensions must be multiples of 8 (the synthesized fixtures are;
    a general encoder would edge-pad).
    """
    h, w = arr.shape
    if h % 8 or w % 8:
        raise ValueError("encode_gray_jpeg requires multiple-of-8 dims")
    if not 1 <= q <= 255:
        raise ValueError("q must fit an 8-bit DQT entry")

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # DQT: Pq=0 (8-bit), Tq=0, entries in zigzag order (uniform, so
    # the order is moot, but emit spec-shaped anyway)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([q] * 64)
    # SOF0: 8-bit precision, 1 component (id 1, 1x1 sampling, table 0)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    # DHT: DC table class 0 id 0, AC table class 1 id 0
    dc_payload = bytes([0x00] + DC_BITS + DC_VALUES)
    ac_payload = bytes([0x10] + AC_BITS + AC_VALUES)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dc_payload)) + dc_payload
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(ac_payload)) + ac_payload
    # SOS: 1 component, DC table 0 / AC table 0, spectral 0..63
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    writer = _BitWriter()
    prev_dc = 0
    shifted = arr.astype(np.float64) - 128.0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = shifted[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coef = _C @ block @ _C.T
            quant = np.floor(coef / q + 0.5).astype(np.int64)
            zz = quant.ravel()[ZIGZAG]
            # DC: category + amplitude of the differential
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            t = _category(diff)
            code, length = _DC_ENC[t]
            writer.write(code, length)
            if t:
                writer.write(_amplitude_bits(diff, t), t)
            # AC: (run, size) symbols with ZRL/EOB
            run = 0
            for v in zz[1:]:
                v = int(v)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _AC_ENC[0xF0]  # ZRL: 16 zeros
                    writer.write(code, length)
                    run -= 16
                t = _category(v)
                code, length = _AC_ENC[(run << 4) | t]
                writer.write(code, length)
                writer.write(_amplitude_bits(v, t), t)
                run = 0
            if run:
                code, length = _AC_ENC[0x00]  # EOB
                writer.write(code, length)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------- decoder

def decode_gray_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to a 2D uint8 array.

    Full path: marker walk, DQT/DHT/SOF0/SOS parse, canonical Huffman
    reconstruction, entropy decode with byte unstuffing, DC EXTEND +
    prediction, AC run-length/EOB/ZRL, de-zigzag, dequantize, float
    IDCT, level shift, half-up round, clamp. Handles any DQT/DHT the
    stream declares (not just this module's encoder defaults) and
    non-multiple-of-8 dims via decode-then-crop.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_q = 0
    scan_dc = scan_ac = 0
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit DQT not supported (baseline)")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[s + 1:s + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                s += 65
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if ncomp != 1:
                raise ValueError("only grayscale (1-component) supported")
            comp_q = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("not a baseline-SOF0 JPEG")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1:s + 17])
                n = sum(bits)
                values = list(seg[s + 17:s + 17 + n])
                htables[(tc, th)] = _decode_table(bits, values)
                s += 17 + n
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != 1:
                raise ValueError("only single-scan grayscale supported")
            scan_dc, scan_ac = seg[2] >> 4, seg[2] & 0x0F
            data_start = pos + seg_len
            break
        pos += seg_len
    if data_start is None or h is None:
        raise ValueError("truncated JPEG (no SOS/SOF)")

    # entropy data runs until the EOI marker
    end = payload.rfind(b"\xff\xd9")
    reader = _BitReader(payload[data_start:end])
    dc_tab = htables[(0, scan_dc)]
    ac_tab = htables[(1, scan_ac)]
    qt = qtables[comp_q].astype(np.float64)

    bx_n, by_n = (w + 7) // 8, (h + 7) // 8
    img = np.zeros((by_n * 8, bx_n * 8), dtype=np.float64)
    prev_dc = 0
    for by in range(by_n):
        for bx in range(bx_n):
            zz = np.zeros(64, dtype=np.int64)
            t = _decode_symbol(reader, dc_tab)
            prev_dc += _extend(reader.read_bits(t), t)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _decode_symbol(reader, ac_tab)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("bad AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k >= 64:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(reader.read_bits(size), size)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[ZIGZAG] = zz
            block = _C.T @ (coef.reshape(8, 8) * qt) @ _C
            img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = block
    out = np.floor(img + 128.0 + 0.5)  # half-up, matching the oracle
    return np.clip(out, 0, 255)[:h, :w].astype(np.uint8)


# --------------------------------------------------------- synthesis

def synthesize_gray_jpeg(doc_id: int, q: int = DEFAULT_Q) -> bytes:
    """Per-doc synthesized JPEG in the codec's lossless subspace:
    block-constant pixels with EVEN level-shifted values,

        w_blocks = 2 + doc_id % 3,  h_blocks = 2 + (doc_id // 3) % 3
        v(bx, by) = 2 * ((37*bx + 53*by + 11*(doc_id % 251)) % 128)

    With the uniform q=16 table a constant block quantizes to the
    exact integer (v-128)/2 (0.5 clear of every round boundary, so
    float DCT noise cannot flip it) and decodes back to v EXACTLY —
    which is what lets mm_jpeg_stats hash-oracle a lossy codec. The
    per-block DC walk still sweeps positive and negative differentials
    of varying category, so the Huffman/DC-prediction path is
    genuinely exercised."""
    wb = 2 + doc_id % 3
    hb = 2 + (doc_id // 3) % 3
    s = doc_id % 251
    bx, by = np.meshgrid(np.arange(wb), np.arange(hb))
    v = 2 * ((37 * bx + 53 * by + 11 * s) % 128)
    img = np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    return encode_gray_jpeg(img, q=q)
