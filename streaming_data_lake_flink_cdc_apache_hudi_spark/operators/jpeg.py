"""Baseline JPEG codec — pure stdlib + numpy, from the PUBLIC ITU
T.81 spec only (no PIL/turbojpeg in this container).

Closes the longest-standing declared stub in
``operators/multimodal.py``: ``_decode_bytes`` previously raised on
the ``FF D8 FF`` magic. The decoder covers the baseline sequential
DCT process (SOF0) that the overwhelming majority of real-world
JPEGs use: DQT (8- and 16-bit tables), DHT, interleaved scans with
arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 tested), restart
markers (DRI/RSTn with byte-alignment + DC-predictor reset), byte
stuffing, and 1- or 3-component images (grayscale / YCbCr per the
JFIF convention). Progressive (SOF2), arithmetic coding, 12-bit
precision, and 4-component CMYK raise ``NotImplementedError`` — the
documented boundary, now far narrower than "all of JPEG".

The encoder exists to SELF-GENERATE fixtures (the same pattern as
the PNG/BMP/Avro/murmur3 codecs here): standard Annex K quantization
+ Huffman tables, libjpeg's quality scaling, 4:4:4 or 4:2:0
subsampling, optional restart intervals. Encode->decode round trips
pin the decoder against known pixels within JPEG's lossy tolerance.

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
) -> int:
    coef = _M @ (block - 128.0) @ _M.T
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
    """Decode a baseline-sequential JPEG to (width, height, RGB24)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) decodes here "
                f"(SOF marker 0x{marker:02X}) — progressive/arithmetic/"
                "lossless need an external decoder"
            )
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = {}
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                scan[cid] = (tids >> 4, tids & 0xF)
            return _decode_scan(
                b, pos, w, h, comps, scan, qtabs, htabs, restart
            )
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(b, pos, w, h, comps, scan, qtabs, htabs, restart):
    if not comps or not w or not h:
        raise ValueError("JPEG SOS before SOF")
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
                            pix = _M.T @ coef @ _M + 128.0
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
    # upsample each component to full resolution by replication
    full = []
    for ci, c in enumerate(comps):
        ys = (np.arange(h) * c["v"]) // max_v
        xs = (np.arange(w) * c["h"]) // max_h
        full.append(planes[ci][np.ix_(ys, xs)])
    if len(comps) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return w, h, np.repeat(g[..., None], 3, axis=2).tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=2)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
