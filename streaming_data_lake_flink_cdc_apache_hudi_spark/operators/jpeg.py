"""JPEG codec — pure stdlib + numpy, from the PUBLIC ITU T.81 spec
only (no PIL/turbojpeg in this container).

Closes the longest-standing declared stub in
``operators/multimodal.py``: ``_decode_bytes`` previously raised on
the ``FF D8 FF`` magic. The decoder covers the baseline sequential
DCT process (SOF0) that the overwhelming majority of real-world
JPEGs use — DQT (8- and 16-bit tables), DHT, interleaved scans with
arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 tested), restart
markers (DRI/RSTn with byte-alignment + DC-predictor reset), byte
stuffing, 1- or 3-component images (grayscale / YCbCr per the JFIF
convention) — AND (new r9) the progressive Huffman process (SOF2):
multi-scan spectral selection + successive approximation per T.81
Annex G, EOB runs, AC refinement correction bits, interleaved DC /
non-interleaved AC scan geometry, restart markers inside progressive
scans — AND (new r10) the LOSSLESS Huffman process (SOF3, T.81
Annex H — the DNG/medical-archive profile): predictors 1-7 over
decoded neighbors, point transform, SSSS-category differences modulo
2^16 (SSSS 16 = 32768), 2-16-bit precision mapped to the RGB24
contract — AND (new r10) 4-component Adobe CMYK/YCCK baseline files
(APP14 transform byte; inverted ink values per the libjpeg
convention, RGB = s*s_k/255) — AND (new r11) 12-BIT EXTENDED
SEQUENTIAL files (SOF1 precision 12, T.81 §4.11, the
medical/scientific DCT profile): 16-bit DQT entries (Pq=1), the
wider SSSS alphabet, level shift 2^11, P-bit range mapped onto the
RGB24 contract. Arithmetic coding and hierarchical processes raise
``NotImplementedError`` — the documented boundary, now covering the
three Huffman processes at both DCT precisions and all the
component layouts real encoders emit.

The encoders exist to SELF-GENERATE fixtures (the same pattern as
the PNG/BMP/Avro/murmur3 codecs here): standard Annex K quantization
+ Huffman tables, libjpeg's quality scaling, 4:4:4 or 4:2:0
subsampling, optional restart intervals, and a progressive scan
script with per-scan Huffman tables. Because the successive-
approximation split is losslessly invertible, decoding a progressive
encoding is BIT-IDENTICAL to decoding the baseline encoding of the
same image at the same quality — the round-trip tests pin exactly
that, which checks both progressive paths against the independently-
tested baseline path.

Scale shape: decoding runs inside ``mapInPandas`` Arrow batches (one
image per row, executor-side) exactly like the other codecs — the
driver never sees pixels. The hot loops are numpy block math (IDCT as
two 8x8 matmuls); the Huffman bit walk is per-symbol Python, which is
the honest cost of a dependency-free decoder and is isolated per
image/task.
"""

from __future__ import annotations

import numpy as np

# -- public tables (ITU T.81 Annex K) ---------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_Q_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

_Q_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (BITS counts per code length 1..16, HUFFVAL symbol list) — Annex K.3
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-walk decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


# orthonormal DCT-II matrix: forward F = M B Mt, inverse B = Mt F M
_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's public quality->table scaling."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = [(v * scale + 50) // 100 for v in base]
        out.append(np.array([min(max(v, 1), 255) for v in t]).reshape(8, 8))
    return out[0], out[1]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
    center: float = 128.0,
) -> int:
    coef = _M @ (block - center) @ _M.T
    q = np.round(coef / qtab).astype(int)
    zz = q.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred

    def put(v: int, codes: dict) -> None:
        s = int(abs(v)).bit_length()
        code, length = codes[s]
        bw.write(code, length)
        if s:
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)

    put(diff, dc_codes)
    run = 0
    for v in zz[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = v if v >= 0 else -v
        size = s.bit_length()
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Baseline sequential JPEG encoder (SOF0, Annex K tables).
    ``subsample``: ``"444"`` (no chroma subsampling) or ``"420"``
    (2x2 luma sampling, averaged chroma — the common camera layout).
    ``restart_interval`` > 0 writes DRI + RSTn markers every N MCUs
    (the decoder-resync feature real encoders emit for robustness).
    ``grayscale`` writes a 1-component scan (luma only)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be 444|420, got {subsample!r}")
    if grayscale:
        subsample = "444"
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    # JFIF YCbCr
    y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    cb = -0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2] + 128.0
    cr = 0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2] + 128.0
    qy, qc = _quality_tables(quality)
    hy = vy = 2 if subsample == "420" else 1
    mcu_w, mcu_h = 8 * hy, 8 * vy
    mcux = -(-width // mcu_w)
    mcuy = -(-height // mcu_h)

    def pad(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    yp = pad(y, mcuy * mcu_h, mcux * mcu_w)
    if subsample == "420":
        cbp = pad(cb, mcuy * mcu_h, mcux * mcu_w)
        crp = pad(cr, mcuy * mcu_h, mcux * mcu_w)
        cbp = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crp = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbp = pad(cb, mcuy * 8, mcux * 8)
        crp = pad(cr, mcuy * 8, mcux * 8)

    dcl = _canonical_codes(*_DC_LUMA)
    dcc = _canonical_codes(*_DC_CHROMA)
    acl = _canonical_codes(*_AC_LUMA)
    acc = _canonical_codes(*_AC_CHROMA)
    bw = _BitWriter()
    preds = [0, 0, 0]
    rst, n_mcu = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.pad()
                bw.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for by in range(vy):
                for bx in range(hy):
                    r0, c0 = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    preds[0] = _encode_block(
                        bw, yp[r0 : r0 + 8, c0 : c0 + 8], qy, dcl, acl, preds[0]
                    )
            if not grayscale:
                r0, c0 = my * 8, mx * 8
                preds[1] = _encode_block(
                    bw, cbp[r0 : r0 + 8, c0 : c0 + 8], qc, dcc, acc, preds[1]
                )
                preds[2] = _encode_block(
                    bw, crp[r0 : r0 + 8, c0 : c0 + 8], qc, dcc, acc, preds[2]
                )
            n_mcu += 1
    bw.pad()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(tab.flatten()[i]) for i in ZIGZAG))

    def dht(cls: int, tid: int, bits: list[int], values: list[int]) -> bytes:
        return seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(values))

    if grayscale:
        sof = seg(
            0xC0,
            bytes([8])
            + height.to_bytes(2, "big")
            + width.to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0]),
        )
        sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        sof = seg(
            0xC0,
            bytes([8])
            + height.to_bytes(2, "big")
            + width.to_bytes(2, "big")
            + bytes([3])
            + bytes([1, hy << 4 | vy, 0])
            + bytes([2, 0x11, 1])
            + bytes([3, 0x11, 1]),
        )
        sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out = bytearray(b"\xff\xd8")  # SOI
    out += dqt(0, qy)
    out += sof
    out += dht(0, 0, *_DC_LUMA) + dht(1, 0, *_AC_LUMA)
    if not grayscale:
        out += dqt(1, qc)
        out += dht(0, 1, *_DC_CHROMA) + dht(1, 1, *_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment: 0xFF00 stuffing
    dropped, stops AT markers (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Discard partial byte, expect and consume a marker; returns
        the marker code byte."""
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1  # pad bytes before RST are tolerated
        while self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _read_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(b: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2,
    new r9) JPEG to (width, height, RGB24). Progressive files decode
    scan by scan into per-component coefficient arrays (spectral
    selection + successive approximation per T.81 Annex G), then
    reconstruct once at EOI."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    progressive = False
    lossless = False
    precision = 8
    adobe = None  # APP14 transform: 0 CMYK/RGB direct, 1 YCbCr, 2 YCCK
    coefs: list[np.ndarray] = []
    while pos < len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            if progressive and coefs:
                return _reconstruct(w, h, comps, coefs, qtabs, adobe)
            break
        size = int.from_bytes(b[pos + 2 : pos + 4], "big")
        body = b[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec:
                    vals = [
                        int.from_bytes(body[i + 2 * k : i + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                    i += 128
                else:
                    vals = list(body[i : i + 64])
                    i += 64
                t = np.zeros(64)
                for k, zz in enumerate(ZIGZAG):
                    t[zz] = vals[k]
                qtabs[tid] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                htabs[(cls, tid)] = _decode_table(bits, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            # SOF0/1 baseline, SOF2 progressive, SOF3 LOSSLESS (r10)
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            prec = body[0]
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(f"JPEG lossless precision {prec}")
            elif marker == 0xC1 and prec == 12:
                pass  # extended sequential 12-bit (T.81 §4.11, r11)
            elif prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            precision = prec
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3, 4) or (lossless and nc == 4):
                raise NotImplementedError(f"JPEG with {nc} components")
            comps = [
                {
                    "id": body[6 + 3 * i],
                    "h": body[7 + 3 * i] >> 4,
                    "v": body[7 + 3 * i] & 0xF,
                    "q": body[8 + 3 * i],
                }
                for i in range(nc)
            ]
            if lossless and any(
                c["h"] != 1 or c["v"] != 1 for c in comps
            ):
                raise NotImplementedError(
                    "lossless JPEG with subsampled components"
                )
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1), progressive-Huffman "
                "(SOF2) and lossless-Huffman (SOF3) JPEG decode here "
                f"(SOF marker 0x{marker:02X}) — arithmetic/"
                "hierarchical need an external decoder"
            )
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe = body[11]  # APP14 color-transform byte
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = {}
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                scan[cid] = (tids >> 4, tids & 0xF)
            if lossless:
                pred_sel = body[1 + 2 * ns]  # Ss = predictor id
                pt = body[3 + 2 * ns] & 0xF  # Al = point transform
                return _decode_lossless_scan(
                    b, pos, w, h, comps, scan, htabs, restart,
                    pred_sel, pt, precision,
                )
            if not progressive:
                return _decode_scan(
                    b, pos, w, h, comps, scan, qtabs, htabs, restart,
                    adobe, precision,
                )
            if not comps or not w or not h:
                raise ValueError("JPEG SOS before SOF")
            if not coefs:
                max_h = max(c["h"] for c in comps)
                max_v = max(c["v"] for c in comps)
                mcux = -(-w // (8 * max_h))
                mcuy = -(-h // (8 * max_v))
                coefs = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
                    for c in comps
                ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            aa = body[3 + 2 * ns]
            pos = _progressive_scan(
                b, pos, w, h, comps, scan, ss, se, aa >> 4, aa & 0xF,
                restart, htabs, coefs,
            )
    if progressive and coefs:  # EOI missing but scans complete
        return _reconstruct(w, h, comps, coefs, qtabs, adobe)
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(b, pos, w, h, comps, scan, qtabs, htabs, restart,
                 adobe=None, precision=8):
    if not comps or not w or not h:
        raise ValueError("JPEG SOS before SOF")
    # 12-bit extended sequential (r11): level shift 2^(P-1), then map
    # the P-bit range onto the RGB24 contract before color transform
    center = float(1 << (precision - 1))
    scale = float(1 << (precision - 8))
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    done = False
    for my in range(mcuy):
        if done:
            break
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                m = br.align_to_marker()
                if 0xD0 <= m <= 0xD7:
                    preds = [0] * len(comps)
                elif m == 0xD9:
                    done = True
                    break
                else:
                    raise ValueError(f"expected RSTn, got 0x{m:02X}")
            try:
                for ci, c in enumerate(comps):
                    dc_t = htabs[(0, scan[c["id"]][0])]
                    ac_t = htabs[(1, scan[c["id"]][1])]
                    q = qtabs[c["q"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            s = _read_huff(br, dc_t)
                            diff = _extend(br.bits(s), s) if s else 0
                            preds[ci] += diff
                            zz = np.zeros(64)
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _read_huff(br, ac_t)
                                if rs == 0x00:  # EOB
                                    break
                                run, size = rs >> 4, rs & 0xF
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += run
                                if k > 63:
                                    raise ValueError("AC index overrun")
                                zz[k] = _extend(br.bits(size), size)
                                k += 1
                            blk = np.zeros(64)
                            for i, z in enumerate(ZIGZAG):
                                blk[z] = zz[i]
                            coef = blk.reshape(8, 8) * q
                            pix = (_M.T @ coef @ _M + center) / scale
                            r0 = (my * c["v"] + by) * 8
                            c0 = (mx * c["h"] + bx) * 8
                            planes[ci][r0 : r0 + 8, c0 : c0 + 8] = pix
            except _MarkerHit as mh:
                if mh.marker == 0xD9:
                    done = True
                    break
                raise ValueError(
                    f"unexpected marker 0x{mh.marker:02X} in scan"
                ) from None
            n_mcu += 1
    return _planes_to_rgb(w, h, comps, planes, adobe)


def _planes_to_rgb(w, h, comps, planes, adobe=None):
    """Upsample each component plane to full resolution by replication
    and convert to RGB24 (shared by the baseline, progressive and
    CMYK paths). ``adobe`` is the APP14 color-transform byte: for
    4-component files, 0 = direct (inverted) CMYK, 2 = YCCK — Adobe
    CMYK JPEGs store INVERTED ink values (s = 255 - ink, the libjpeg
    convention), so RGB = s_c * s_k / 255 per channel; for
    3-component files, 0 = RGB stored directly (no YCbCr)."""
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        ys = (np.arange(h) * c["v"]) // max_v
        xs = (np.arange(w) * c["h"]) // max_h
        full.append(planes[ci][np.ix_(ys, xs)])
    if len(comps) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return w, h, np.repeat(g[..., None], 3, axis=2).tobytes()
    if len(comps) == 4:
        if adobe == 2:  # YCCK: first three channels ride the YCbCr
            y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
            sc = y + 1.402 * cr
            sm = y - 0.344136 * cb - 0.714136 * cr
            sy = y + 1.772 * cb
        elif adobe in (None, 0):  # direct (inverted) CMYK
            sc, sm, sy = full[0], full[1], full[2]
        else:
            raise NotImplementedError(
                f"4-component JPEG with APP14 transform {adobe}"
            )
        sk = np.clip(full[3], 0, 255)
        rgb = np.stack(
            [np.clip(x, 0, 255) * sk / 255.0 for x in (sc, sm, sy)],
            axis=2,
        )
        return (
            w, h,
            np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes(),
        )
    if adobe == 0:  # 3-component, explicitly untransformed: RGB
        rgb = np.stack(full, axis=2)
        return (
            w, h,
            np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes(),
        )
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=2)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


# -- progressive JPEG (SOF2, new r9): T.81 Annex G Huffman process ---------
#
# A progressive file carries the SAME quantized coefficients as a
# baseline file, split across scans two ways: SPECTRAL SELECTION (each
# AC scan covers one zigzag band [Ss..Se] of ONE component; DC scans
# cover coefficient 0, optionally interleaved) and SUCCESSIVE
# APPROXIMATION (the first scan of a band sends the coefficients at
# reduced precision — DC arithmetic-shifted by Al, AC point-transformed
# toward zero — and refinement scans (Ah>0) send one lower bit each).
# The split is losslessly invertible, so a progressive decode of the
# same coefficients is BIT-IDENTICAL to the baseline decode — which the
# tests pin. The scan algorithms below mirror T.81 G.1.2/G.2 (the same
# control flow libjpeg's public jdphuff.c documents): EOB runs (EOBn
# symbols batch end-of-band across blocks), ZRL in both passes, and
# refinement correction bits for already-significant coefficients.


def _progressive_scan(
    b, pos, w, h, comps, scan, ss, se, ah, al, restart, htabs, coefs
):
    """Decode one progressive SOS's entropy segment into the per-
    component zigzag coefficient arrays; returns the position of the
    terminating marker."""
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    sel = [ci for ci, c in enumerate(comps) if c["id"] in scan]
    if not sel:
        raise ValueError("scan references unknown components")
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive scan mixing DC and AC bands")
    if not is_dc and len(sel) != 1:
        raise ValueError("progressive AC scans are single-component")
    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    state = {"eobrun": 0}

    def dc_block(ci, by, bx):
        blk = coefs[ci][by, bx]
        if ah == 0:
            dc_t = htabs[(0, scan[comps[ci]["id"]][0])]
            s = _read_huff(br, dc_t)
            diff = _extend(br.bits(s), s) if s else 0
            preds[ci] += diff
            blk[0] = preds[ci] << al
        elif br.bit():
            blk[0] |= 1 << al

    def ac_first(ci, by, bx):
        if state["eobrun"]:
            state["eobrun"] -= 1
            return
        ac_t = htabs[(1, scan[comps[ci]["id"]][1])]
        blk = coefs[ci][by, bx]
        k = ss
        while k <= se:
            rs = _read_huff(br, ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC band overrun")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1

    def ac_refine(ci, by, bx):
        p1, m1 = 1 << al, -(1 << al)
        ac_t = htabs[(1, scan[comps[ci]["id"]][1])]
        blk = coefs[ci][by, bx]

        def correct(k):
            c = int(blk[k])
            if c and br.bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _read_huff(br, ac_t)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:  # EOBn: refine the rest, then skip
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.bits(r)
                        break
                    # ZRL: pass 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("AC refinement size != 1")
                    val = p1 if br.bit() else m1
                while k <= se:
                    if blk[k]:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("AC refinement overrun")
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                correct(k)
                k += 1
            state["eobrun"] -= 1

    decode_one = dc_block if is_dc else (
        ac_first if ah == 0 else ac_refine
    )

    # unit list: MCUs when interleaved, the single component's own
    # block raster otherwise (T.81 A.2: non-interleaved dimensions
    # come from ceil(comp_size/8), no MCU padding)
    units: list[list[tuple[int, int, int]]] = []
    if is_dc and len(sel) > 1:
        mcux = -(-w // (8 * max_h))
        mcuy = -(-h // (8 * max_v))
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci in sel:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append(
                                (ci, my * c["v"] + by, mx * c["h"] + bx)
                            )
                units.append(unit)
    else:
        ci = sel[0]
        c = comps[ci]
        nbx = -(-(-(-w * c["h"] // max_h)) // 8)
        nby = -(-(-(-h * c["v"] // max_v)) // 8)
        for by in range(nby):
            for bx in range(nbx):
                units.append([(ci, by, bx)])
    n = 0
    done = False
    for unit in units:
        if done:
            break
        if restart and n and n % restart == 0:
            m = br.align_to_marker()
            if 0xD0 <= m <= 0xD7:
                preds[:] = [0] * len(comps)
                state["eobrun"] = 0
            elif m == 0xD9:
                break
            else:
                raise ValueError(f"expected RSTn, got 0x{m:02X}")
        try:
            for ci, by, bx in unit:
                decode_one(ci, by, bx)
        except _MarkerHit as mh:
            if mh.marker == 0xD9:
                done = True
                break
            raise ValueError(
                f"unexpected marker 0x{mh.marker:02X} in scan"
            ) from None
        n += 1
    return br.pos


def _reconstruct(w, h, comps, coefs, qtabs, adobe=None):
    """Dequantize + IDCT the accumulated progressive coefficients and
    hand off to the shared upsample/color-convert."""
    planes = []
    for ci, c in enumerate(comps):
        zz = coefs[ci]  # (nby, nbx, 64) zigzag order
        nby, nbx = zz.shape[:2]
        nat = np.zeros_like(zz, dtype=np.float64)
        nat[:, :, ZIGZAG] = zz  # natural[ZIGZAG[i]] = zigzag[i]
        blocks = nat.reshape(nby, nbx, 8, 8) * qtabs[c["q"]]
        pix = np.einsum("ij,abjk,kl->abil", _M.T, blocks, _M) + 128.0
        planes.append(
            pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
    return _planes_to_rgb(w, h, comps, planes, adobe)


def _quantized_components(width, height, rgb, quality, subsample, grayscale):
    """Forward path shared math for the progressive encoder: color
    convert, pad, (optionally) subsample, DCT + quantize every block.
    Returns (comp_specs, per-comp zigzag coefficient arrays
    (nby, nbx, 64) int)."""
    a = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    cb = (
        -0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2]
        + 128.0
    )
    cr = (
        0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2]
        + 128.0
    )
    qy, qc = _quality_tables(quality)
    hy = vy = 2 if (subsample == "420" and not grayscale) else 1
    mcux = -(-width // (8 * hy))
    mcuy = -(-height // (8 * vy))

    def pad(plane, ph, pw):
        return np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    planes = [(pad(y, mcuy * vy * 8, mcux * hy * 8), qy)]
    if not grayscale:
        if hy == 2:
            cbp = pad(cb, mcuy * 16, mcux * 16)
            crp = pad(cr, mcuy * 16, mcux * 16)
            cbp = cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
            crp = crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        else:
            cbp = pad(cb, mcuy * 8, mcux * 8)
            crp = pad(cr, mcuy * 8, mcux * 8)
        planes += [(cbp, qc), (crp, qc)]
    if grayscale:
        specs = [{"id": 1, "h": 1, "v": 1, "q": 0}]
    else:
        specs = [
            {"id": 1, "h": hy, "v": vy, "q": 0},
            {"id": 2, "h": 1, "v": 1, "q": 1},
            {"id": 3, "h": 1, "v": 1, "q": 1},
        ]
    coefs = []
    for plane, qt in planes:
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
        )
        c = np.einsum("ij,abjk,kl->abil", _M, blocks, _M.T)
        q = np.round(c / qt).astype(np.int64)
        coefs.append(q.reshape(nby, nbx, 64)[:, :, ZIGZAG])
    return specs, coefs, (qy, qc)


def _uniform_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """A valid canonical Huffman table giving every used symbol the
    same code length (fixture-encoder simplicity over optimality);
    n <= 2^L - 1 keeps the all-ones code unassigned per T.81."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(2, (n + 1 - 1).bit_length())
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


def encode_jpeg_progressive(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    subsample: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Progressive JPEG encoder (SOF2) for fixtures — the same
    quantized coefficients the baseline encoder produces, emitted as
    a 2-level successive-approximation scan script:

    1. DC first, all components interleaved, Al=1
    2. per component: AC first scans (bands 1-5 and 6-63), Al=1
    3. DC refinement, Ah=1 -> Al=0 (raw bits)
    4. per component: AC refinement of 1-63, Ah=1 -> Al=0

    AC scans get per-scan Huffman tables (two passes: collect the
    symbol set — EOBn symbols are not in the Annex K tables — then
    emit with a uniform-length canonical table). Because the
    approximation split is lossless, ``decode_jpeg`` of this output
    is bit-identical to decoding the baseline encoding — the
    round-trip tests pin exactly that."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be 444|420, got {subsample!r}")
    specs, coefs, (qy, qc) = _quantized_components(
        width, height, rgb, quality, subsample, grayscale
    )
    max_h = max(s["h"] for s in specs)
    max_v = max(s["v"] for s in specs)
    mcux = -(-width // (8 * max_h))
    mcuy = -(-height // (8 * max_v))

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes((0xFF, marker))
            + (len(body) + 2).to_bytes(2, "big")
            + body
        )

    def sos(comp_tids: list[tuple[int, int, int]], ss, se, ah, al):
        body = bytes([len(comp_tids)])
        for cid, td, ta in comp_tids:
            body += bytes([cid, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xDB,
        bytes([0]) + bytes(int(qy.flatten()[i]) for i in ZIGZAG),
    )
    if not grayscale:
        out += seg(
            0xDB,
            bytes([1]) + bytes(int(qc.flatten()[i]) for i in ZIGZAG),
        )
    sof_body = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(
        2, "big"
    ) + bytes([len(specs)])
    for s in specs:
        sof_body += bytes([s["id"], (s["h"] << 4) | s["v"], s["q"]])
    out += seg(0xC2, sof_body)
    out += seg(
        0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1])
    )
    if not grayscale:
        out += seg(
            0xC4,
            bytes([0x01]) + bytes(_DC_CHROMA[0]) + bytes(_DC_CHROMA[1]),
        )

    if restart_interval:
        # DRI applies to every scan; the interval counts each scan's
        # own units (MCUs interleaved, blocks non-interleaved)
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))

    # --- scan 1: DC first (interleaved), Al=1 ---
    bw = _BitWriter()
    dc_codes = [
        _canonical_codes(*(_DC_LUMA if s["q"] == 0 else _DC_CHROMA))
        for s in specs
    ]
    preds = [0] * len(specs)
    rst = n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.pad()
                bw.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0] * len(specs)
            n_mcu += 1
            for ci, s in enumerate(specs):
                for by in range(s["v"]):
                    for bx in range(s["h"]):
                        dc = int(
                            coefs[ci][my * s["v"] + by, mx * s["h"] + bx, 0]
                        )
                        t = dc >> 1  # arithmetic point transform
                        diff = t - preds[ci]
                        preds[ci] = t
                        sz = abs(diff).bit_length()
                        code, ln = dc_codes[ci][sz]
                        bw.write(code, ln)
                        if sz:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << sz) - 1,
                                sz,
                            )
    bw.pad()
    out += sos(
        [(s["id"], s["q"], 0) for s in specs], 0, 0, 0, 1
    ) + bw.out

    # --- AC scans: two passes each (symbol set -> uniform table) ---
    def _ac_blocks(ci):
        # non-interleaved scans cover ceil(comp/8) blocks (T.81 A.2),
        # NOT the MCU-padded grid the DC interleave addresses
        s = specs[ci]
        nbx = -(--(-width * s["h"] // max_h) // 8)
        nby = -(--(-height * s["v"] // max_v) // 8)
        return coefs[ci][:nby, :nbx].reshape(-1, 64)

    def ac_first_scan(ci, ss, se, al):
        blocks = _ac_blocks(ci)

        def run(emit_sym, emit_bits, emit_restart=lambda: None):
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    emit_sym(r << 4)
                    emit_bits(eobrun - (1 << r), r)
                    eobrun = 0

            for bi, blk in enumerate(blocks):
                if restart_interval and bi and bi % restart_interval == 0:
                    flush_eob()
                    emit_restart()
                band = blk[ss : se + 1]
                vals = [
                    (v >> al) if v >= 0 else -((-v) >> al)
                    for v in map(int, band)
                ]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                runlen = 0
                for v in vals:
                    if v == 0:
                        runlen += 1
                        continue
                    while runlen > 15:
                        emit_sym(0xF0)
                        runlen -= 16
                    sz = abs(v).bit_length()
                    emit_sym((runlen << 4) | sz)
                    emit_bits(v if v >= 0 else v + (1 << sz) - 1, sz)
                    runlen = 0
                if runlen:
                    eobrun = 1
            flush_eob()

        return run

    def ac_refine_scan(ci, ss, se, al):
        blocks = _ac_blocks(ci)

        def run(emit_sym, emit_bits, emit_restart=lambda: None):
            eobrun = 0
            pending: list[int] = []

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    emit_sym(r << 4)
                    emit_bits(eobrun - (1 << r), r)
                    eobrun = 0
                for bit in pending:
                    emit_bits(bit, 1)
                pending.clear()

            for bi, blk in enumerate(blocks):
                if restart_interval and bi and bi % restart_interval == 0:
                    flush_eob()
                    emit_restart()
                band = [int(v) for v in blk[ss : se + 1]]
                absv = [abs(v) >> al for v in band]
                eobpos = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        eobpos = i
                runlen = 0
                br_local: list[int] = []
                for i, t in enumerate(absv):
                    if t == 0:
                        runlen += 1
                        continue
                    # emit ZRLs as soon as the zero-history run
                    # exceeds 15 at ANY nonzero (correction coefs
                    # included) unless it folds into the EOB —
                    # the decoder's ZRL walk reads the buffered
                    # correction bits positionally, so deferring
                    # desyncs the stream (T.81 G.1.2.3 order)
                    while runlen > 15 and i <= eobpos:
                        flush_eob()
                        emit_sym(0xF0)
                        runlen -= 16
                        for bit in br_local:
                            emit_bits(bit, 1)
                        br_local = []
                    if t > 1:
                        br_local.append(t & 1)
                        continue
                    # newly significant (t == 1)
                    flush_eob()
                    emit_sym((runlen << 4) | 1)
                    emit_bits(1 if band[i] >= 0 else 0, 1)
                    for bit in br_local:
                        emit_bits(bit, 1)
                    br_local = []
                    runlen = 0
                if runlen > 0 or br_local:
                    eobrun += 1
                    pending.extend(br_local)
                    if eobrun == 0x7FFF or len(pending) > 900:
                        flush_eob()
            flush_eob()

        return run

    def emit_ac_scan(ci, ss, se, ah, al, run):
        syms: set[int] = set()
        run(syms.add, lambda v, n: None)
        if not syms:
            syms = {0x00}
        bits, vals = _uniform_table(syms)
        codes = _canonical_codes(bits, vals)
        bw = _BitWriter()
        rst_state = [0]

        def emit_restart():
            bw.pad()
            bw.out += bytes((0xFF, 0xD0 + rst_state[0]))
            rst_state[0] = (rst_state[0] + 1) % 8

        run(
            lambda s: bw.write(*codes[s]),
            lambda v, n: bw.write(v, n) if n else None,
            emit_restart,
        )
        bw.pad()
        return (
            seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
            + sos([(specs[ci]["id"], 0, 0)], ss, se, ah, al)
            + bw.out
        )

    for ci in range(len(specs)):
        if ci == 0:
            out += emit_ac_scan(0, 1, 5, 0, 1, ac_first_scan(0, 1, 5, 1))
            out += emit_ac_scan(
                0, 6, 63, 0, 1, ac_first_scan(0, 6, 63, 1)
            )
        else:
            out += emit_ac_scan(
                ci, 1, 63, 0, 1, ac_first_scan(ci, 1, 63, 1)
            )

    # --- DC refinement (raw bits, no Huffman) ---
    bw = _BitWriter()
    rst = n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.pad()
                bw.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
            n_mcu += 1
            for ci, s in enumerate(specs):
                for by in range(s["v"]):
                    for bx in range(s["h"]):
                        dc = int(
                            coefs[ci][my * s["v"] + by, mx * s["h"] + bx, 0]
                        )
                        bw.write(dc & 1, 1)
    bw.pad()
    out += sos([(s["id"], 0, 0) for s in specs], 0, 0, 1, 0) + bw.out

    # --- AC refinement scans ---
    for ci in range(len(specs)):
        out += emit_ac_scan(
            ci, 1, 63, 1, 0, ac_refine_scan(ci, 1, 63, 0)
        )
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_cmyk(
    width: int,
    height: int,
    cmyk_stored: bytes,
    quality: int = 100,
    transform: int = 0,
) -> bytes:
    """Fixture writer: 4-component Adobe CMYK baseline JPEG (APP14
    color-transform byte 0 = direct, 2 = YCCK). ``cmyk_stored`` is
    width*height*4 bytes in the ADOBE stored convention (inverted
    ink: s = 255 - ink). All four components use the luma tables at
    h=v=1; at quality=100 (all-ones quantization) solid-color blocks
    round-trip exactly, so decoded RGB = s_c*s_k/255 is
    hand-derivable."""
    if len(cmyk_stored) != width * height * 4:
        raise ValueError("cmyk_stored must be width*height*4 bytes")
    if transform not in (0, 2):
        raise ValueError("transform must be 0 (CMYK) or 2 (YCCK)")
    a = (
        np.frombuffer(bytes(cmyk_stored), np.uint8)
        .reshape(height, width, 4)
        .astype(np.float64)
    )
    if transform == 2:
        sc, sm, sy = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * sc + 0.587 * sm + 0.114 * sy
        cb = -0.168736 * sc - 0.331264 * sm + 0.5 * sy + 128.0
        cr = 0.5 * sc - 0.418688 * sm - 0.081312 * sy + 128.0
        chans = [y, cb, cr, a[..., 3]]
    else:
        chans = [a[..., i] for i in range(4)]
    qy, _ = _quality_tables(quality)
    bx = -(-width // 8)
    by = -(-height // 8)

    def pad(plane):
        return np.pad(
            plane,
            ((0, by * 8 - plane.shape[0]), (0, bx * 8 - plane.shape[1])),
            mode="edge",
        )

    chans = [pad(c) for c in chans]
    dcl = _canonical_codes(*_DC_LUMA)
    acl = _canonical_codes(*_AC_LUMA)
    bw = _BitWriter()
    preds = [0, 0, 0, 0]
    for my in range(by):
        for mx in range(bx):
            r0, c0 = my * 8, mx * 8
            for ci in range(4):
                preds[ci] = _encode_block(
                    bw,
                    chans[ci][r0 : r0 + 8, c0 : c0 + 8],
                    qy,
                    dcl,
                    acl,
                    preds[ci],
                )
    bw.pad()

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes((0xFF, marker))
            + (len(body) + 2).to_bytes(2, "big")
            + body
        )

    app14 = seg(
        0xEE,
        b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform]),
    )
    dqt = seg(
        0xDB, bytes([0]) + bytes(int(qy.flatten()[i]) for i in ZIGZAG)
    )
    dht = seg(
        0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1])
    ) + seg(
        0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) + bytes(_AC_LUMA[1])
    )
    sof = seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([4])
        + b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3, 4)),
    )
    sos = seg(
        0xDA,
        bytes([4])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3, 4))
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8" + app14 + dqt + sof + dht + sos
        + bytes(bw.out) + b"\xff\xd9"
    )


# -- lossless JPEG (SOF3, new r10): T.81 Annex H Huffman process ------------
#
# The DNG / medical-archive profile: no DCT, no quantization — each
# sample is predicted from its decoded neighbors (a = left, b = above,
# c = above-left; predictors 1-7 per H.1.2.1) and the difference is
# Huffman-coded as an SSSS magnitude category + extension bits, the
# exact DC-coefficient machinery baseline scans already use. Values
# reconstruct modulo 2^16; SSSS 16 means a difference of 32768 with no
# extension bits. Components are coded directly (no color transform).

def _lossless_predict(plane, x, y, pred_sel, default):
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    if pred_sel == 1:
        return a
    if pred_sel == 2:
        return b
    c = int(plane[y - 1, x - 1])
    if pred_sel == 3:
        return c
    if pred_sel == 4:
        return a + b - c
    if pred_sel == 5:
        return a + ((b - c) >> 1)
    if pred_sel == 6:
        return b + ((a - c) >> 1)
    if pred_sel == 7:
        return (a + b) >> 1
    raise ValueError(f"JPEG lossless predictor {pred_sel}")


def _decode_lossless_scan(
    b, pos, w, h, comps, scan, htabs, restart, pred_sel, pt, prec
):
    if not comps or not w or not h:
        raise ValueError("JPEG SOS before SOF")
    if restart:
        raise NotImplementedError(
            "restart intervals in lossless JPEG scans"
        )
    if set(scan) != {c["id"] for c in comps}:
        raise NotImplementedError(
            "non-interleaved lossless JPEG scans (one scan must cover "
            "every component)"
        )
    if not 1 <= pred_sel <= 7:
        raise ValueError(f"JPEG lossless predictor {pred_sel}")
    tables = []
    for c in comps:
        key = (0, scan[c["id"]][0])
        if key not in htabs:
            raise ValueError(f"JPEG lossless scan without DC table {key}")
        tables.append(htabs[key])
    default = 1 << (prec - pt - 1)
    planes = [np.zeros((h, w), np.int32) for _ in comps]
    br = _BitReader(b, pos)
    for y in range(h):
        for x in range(w):
            for ci in range(len(comps)):
                s = _read_huff(br, tables[ci])
                if s == 16:
                    diff = 32768
                elif s:
                    diff = _extend(br.bits(s), s)
                else:
                    diff = 0
                px = _lossless_predict(
                    planes[ci], x, y, pred_sel, default
                )
                planes[ci][y, x] = (px + diff) & 0xFFFF
    # point transform + P-bit -> 8-bit mapping for the RGB24 contract
    out = []
    for p in planes:
        v = p.astype(np.int64) << pt
        if prec > 8:
            v = v >> (prec - 8)
        elif prec < 8:
            v = v << (8 - prec)
        out.append(np.clip(v, 0, 255).astype(np.uint8))
    if len(out) == 1:
        g = out[0]
        rgb = np.dstack([g, g, g])
    else:
        rgb = np.dstack(out)  # components ARE R,G,B (no transform)
    return w, h, rgb.tobytes()


def encode_jpeg12(
    width: int,
    height: int,
    samples,
    transform: int = 0,
) -> bytes:
    """Fixture writer: 12-BIT EXTENDED SEQUENTIAL JPEG (SOF1, T.81
    §4.11 — the medical/scientific DCT profile). ``samples`` is
    width*height*3 ints in 0..4095, stored as direct RGB (APP14
    Adobe transform 0) with ALL-ONES 16-bit quantization tables (DQT
    Pq=1), so DC-only content — any solid color — reconstructs
    exactly and decodes to ROUND(v/16) per channel on the RGB24
    contract. Huffman tables are uniform-length canonical tables
    over the 12-bit symbol alphabet (DC SSSS 0-15, AC size 1-14 per
    Table F.2), built per file like the progressive fixture
    encoder's."""
    a = np.asarray(list(samples), np.int64).reshape(height, width, 3)
    if a.min() < 0 or a.max() > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    if transform != 0:
        raise ValueError(
            "only transform 0 (direct RGB) is implemented"
        )
    qtab = np.ones((8, 8))
    dc_syms = set(range(16))
    ac_syms = {0x00, 0xF0} | {
        (run << 4) | size for run in range(16) for size in range(1, 15)
    }
    dc_bits, dc_vals = _uniform_table(dc_syms)
    ac_bits, ac_vals = _uniform_table(ac_syms)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)
    bx = -(-width // 8)
    by = -(-height // 8)
    planes = [
        np.pad(
            a[:, :, ci].astype(np.float64),
            ((0, by * 8 - height), (0, bx * 8 - width)),
            mode="edge",
        )
        for ci in range(3)
    ]
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(by):
        for mx in range(bx):
            for ci in range(3):
                preds[ci] = _encode_block(
                    bw,
                    planes[ci][
                        my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8
                    ],
                    qtab,
                    dc_codes,
                    ac_codes,
                    preds[ci],
                    center=2048.0,
                )
    bw.pad()

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes((0xFF, marker))
            + (len(body) + 2).to_bytes(2, "big")
            + body
        )

    dqt = seg(
        0xDB,
        bytes([0x10])  # Pq=1 (16-bit), Tq=0
        + b"".join(
            int(qtab.flatten()[z]).to_bytes(2, "big") for z in ZIGZAG
        ),
    )
    sof = seg(
        0xC1,
        bytes([12])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3])
        + b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3)),
    )
    dht = seg(
        0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
    ) + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    app14 = seg(
        0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform])
    )
    sos = seg(
        0xDA,
        bytes([3])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8" + app14 + dqt + sof + dht + sos
        + bytes(bw.out) + b"\xff\xd9"
    )


def encode_jpeg_lossless(
    width: int,
    height: int,
    rgb: bytes,
    predictor: int = 4,
    pt: int = 0,
) -> bytes:
    """Fixture writer: 8-bit 3-component LOSSLESS JPEG (SOF3),
    predictor 1-7, optional point transform — Annex K DC-luminance
    Huffman table for every component, one interleaved scan. Decoding
    reproduces the input bytes exactly (for pt>0, the input quantized
    to multiples of 2^pt)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    px = np.frombuffer(bytes(rgb), np.uint8).reshape(height, width, 3)
    planes = [
        (px[:, :, ci].astype(np.int32) >> pt) for ci in range(3)
    ]
    dc_codes = _canonical_codes(*_DC_LUMA)
    bw = _BitWriter()
    default = 1 << (8 - pt - 1)
    for y in range(height):
        for x in range(width):
            for plane in planes:
                pred = _lossless_predict(plane, x, y, predictor, default)
                diff = (int(plane[y, x]) - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000  # wrap to the signed window
                s = abs(diff).bit_length()
                if s > 11:
                    # the Annex K DC table defines SSSS 0-11 only; a
                    # 16-bit-precision encoder would need Annex H's
                    # SSSS=16 no-extension-bits special case. 8-bit
                    # inputs keep diffs in [-255, 255], so this is a
                    # guard against silent table overrun if precision
                    # is ever extended (ADVICE r11)
                    raise ValueError(
                        f"encode_jpeg_lossless: diff magnitude category "
                        f"{s} exceeds the 8-bit Annex K DC table"
                    )
                code, length = dc_codes[s]
                bw.write(code, length)
                if s:
                    bw.write(
                        diff if diff >= 0 else diff + (1 << s) - 1, s
                    )
    bw.pad()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    bits, values = _DC_LUMA
    dht = seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(values))
    sof = seg(
        0xC3,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3])
        + b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3)),
    )
    sos = seg(
        0xDA,
        bytes([3])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
        + bytes([predictor, 0, pt]),
    )
    return (
        b"\xff\xd8" + dht + sof + sos + bytes(bw.out) + b"\xff\xd9"
    )
