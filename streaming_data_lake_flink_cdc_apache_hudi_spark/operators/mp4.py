"""ISO-BMFF (MP4/MOV) container codec — pure Python, public spec.

Together with ``operators/avi.py`` this closes the "av containers"
stub in ``operators/multimodal.py``: the container LAYER of MP4/MOV
now parses for real from the public ISO/IEC 14496-12 box structure —
``moov``/``trak``/``mdia``/``minf``/``stbl`` walk, movie + media
timescales and durations, track dimensions (16.16 fixed point),
handler types, sample-description codec fourccs, and the full sample
table (``stsz`` sizes, ``stco``/``co64`` chunk offsets, ``stsc``
sample-to-chunk runs) resolved to per-sample byte ranges.

What decodes END-TO-END: tracks whose sample entry is ``jpeg``
(Motion-JPEG in MP4 — every sample is an independent baseline/
progressive JPEG handled by ``operators/jpeg.py``). Interframe codecs
(``avc1``/``hvc1``/``vp09``/``av01``…) parse to metadata — codec,
dims, frame count, duration — but their ENTROPY layer raises the
declared ``NotImplementedError``: that is the genuinely-external
boundary (reference decoders are hundreds of kLoC), and reporting
container metadata while refusing pixel decode is exactly what a
training-data pipeline needs for corpus statistics + routing.

The writer exists for fixtures: a minimal single-video-track MP4
(``ftyp`` + ``mdat`` + ``moov``) whose layout any standards-based
demuxer accepts, used to pin the parser against an independently-
written encoding of the same spec.

Scale shape: like every codec here, parse + decode run inside
``mapInPandas`` on executors; a file's bytes never leave the worker
holding its payload (``multimodal.sample_video_frames``).
"""

from __future__ import annotations

import struct

from .jpeg import decode_jpeg


def _boxes(b: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) over a box run."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", b, pos)[0]
        btype = b[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", b, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"ISO-BMFF box {btype!r} overruns at {pos}")
        yield btype, body, pos + size
        pos += size


def _find(b: bytes, pos: int, end: int, btype: bytes):
    for t, s, e in _boxes(b, pos, end):
        if t == btype:
            return s, e
    return None


def parse_mp4(b: bytes) -> dict:
    """Parse an MP4/MOV container: movie metadata + the first VIDEO
    track's codec, dimensions, and per-sample (frame) byte ranges.

    Returns ``{"codec", "width", "height", "n_frames", "duration_ms",
    "fps", "frames": [(offset, size), ...]}``. ``decode_mp4_frame``
    turns a range into pixels for ``jpeg`` tracks; other codecs raise
    there (metadata itself always parses)."""
    b = bytes(b)
    head = _find(b, 0, len(b), b"ftyp")
    if head is None:
        raise ValueError("not an ISO-BMFF file (no ftyp box)")
    moov = _find(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("ISO-BMFF file has no moov box")
    mvhd = _find(b, *moov, b"mvhd")
    movie_ms = None
    if mvhd:
        ver = b[mvhd[0]]
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", b, mvhd[0] + 20 + 8)
        else:
            ts, dur = struct.unpack_from(">II", b, mvhd[0] + 12)
        movie_ms = dur * 1000 // ts if ts else None
    for t, s, e in _boxes(b, *moov):
        if t != b"trak":
            continue
        mdia = _find(b, s, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(b, *mdia, b"hdlr")
        if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find(b, s, e, b"tkhd")
        w = h = 0
        if tkhd:
            ver = b[tkhd[0]]
            off = tkhd[1] - 8  # width/height are the LAST 8 bytes
            w16, h16 = struct.unpack_from(">II", b, off)
            w, h = w16 >> 16, h16 >> 16
        mdhd = _find(b, *mdia, b"mdhd")
        mts = mdur = None
        if mdhd:
            ver = b[mdhd[0]]
            if ver == 1:
                mts, mdur = struct.unpack_from(">IQ", b, mdhd[0] + 20)
            else:
                mts, mdur = struct.unpack_from(">II", b, mdhd[0] + 12)
        stbl_parent = _find(b, *mdia, b"minf")
        stbl = _find(b, *stbl_parent, b"stbl") if stbl_parent else None
        if stbl is None:
            raise ValueError("video trak has no sample table")
        stsd = _find(b, *stbl, b"stsd")
        codec = "????"
        if stsd:
            codec = b[stsd[0] + 8 + 4 : stsd[0] + 8 + 8].decode(
                "latin1"
            )
        # sample sizes
        stsz = _find(b, *stbl, b"stsz")
        if stsz is None:
            raise ValueError("sample table has no stsz")
        fixed, count = struct.unpack_from(">II", b, stsz[0] + 4)
        sizes = (
            [fixed] * count
            if fixed
            else list(
                struct.unpack_from(f">{count}I", b, stsz[0] + 12)
            )
        )
        # chunk offsets
        stco = _find(b, *stbl, b"stco")
        if stco:
            n = struct.unpack_from(">I", b, stco[0] + 4)[0]
            offs = list(struct.unpack_from(f">{n}I", b, stco[0] + 8))
        else:
            co64 = _find(b, *stbl, b"co64")
            if co64 is None:
                raise ValueError("sample table has no stco/co64")
            n = struct.unpack_from(">I", b, co64[0] + 4)[0]
            offs = list(struct.unpack_from(f">{n}Q", b, co64[0] + 8))
        # sample-to-chunk runs
        stsc = _find(b, *stbl, b"stsc")
        if stsc is None:
            raise ValueError("sample table has no stsc")
        nruns = struct.unpack_from(">I", b, stsc[0] + 4)[0]
        runs = [
            struct.unpack_from(">III", b, stsc[0] + 8 + 12 * i)
            for i in range(nruns)
        ]
        frames: list[tuple[int, int]] = []
        si = 0
        for ri, (first_chunk, per_chunk, _desc) in enumerate(runs):
            last = (
                runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offs)
            )
            for ci in range(first_chunk - 1, last):
                off = offs[ci]
                for _ in range(per_chunk):
                    if si >= len(sizes):
                        break
                    frames.append((off, sizes[si]))
                    off += sizes[si]
                    si += 1
        dur_ms = (
            mdur * 1000 // mts if mts else movie_ms
        )
        fps = (
            round(len(frames) * mts / mdur)
            if mts and mdur
            else None
        )
        return {
            "codec": codec,
            "width": w,
            "height": h,
            "n_frames": len(frames),
            "duration_ms": dur_ms,
            "fps": fps,
            "frames": frames,
            "_data": b,
        }
    raise ValueError("ISO-BMFF file has no video track")


def decode_mp4_frame(parsed: dict, idx: int) -> tuple[int, int, bytes]:
    """Decode one video sample to (w, h, rgb). Only ``jpeg`` sample
    entries (Motion-JPEG in MP4) decode in-container; interframe
    codecs raise the declared boundary."""
    if parsed["codec"] not in ("jpeg", "mjpa"):
        raise NotImplementedError(
            f"MP4 video codec {parsed['codec']!r}: only jpeg "
            "(Motion-JPEG) samples decode in-container; interframe "
            "codecs need an external decoder"
        )
    off, size = parsed["frames"][idx]
    return decode_jpeg(parsed["_data"][off : off + size])


def encode_mp4_mjpeg(
    width: int,
    height: int,
    frames_rgb: list[bytes],
    fps: int = 10,
    quality: int = 100,
) -> bytes:
    """Minimal single-track MJPEG MP4 writer (fixtures): ftyp + mdat
    of concatenated JPEG samples + a moov with the full sample table
    — an independent encoding of ISO/IEC 14496-12 pinning the
    parser."""
    from .jpeg import encode_jpeg

    if not frames_rgb:
        raise ValueError("need at least one frame")
    jpegs = [
        encode_jpeg(width, height, f, quality=quality)
        for f in frames_rgb
    ]

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    def full(btype: bytes, body: bytes, ver: int = 0) -> bytes:
        return box(btype, struct.pack(">I", ver << 24) + body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat_off = len(ftyp) + 8  # first sample offset inside the file
    mdat = box(b"mdat", b"".join(jpegs))
    ts = fps  # 1 tick per frame
    dur = len(jpegs)
    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, ts, dur)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(
            ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(
            ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", width << 16, height << 16),
        ver=0,
    )
    # flags: enabled|in-movie
    tkhd = tkhd[:8] + b"\x00\x00\x00\x03" + tkhd[12:]
    mdhd = full(
        b"mdhd",
        struct.pack(">IIII", 0, 0, ts, dur) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = full(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"M\x00"
    )
    vmhd = full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), ver=0)
    vmhd = vmhd[:8] + b"\x00\x00\x00\x01" + vmhd[12:]
    dinf = box(
        b"dinf",
        full(
            b"dref",
            struct.pack(">I", 1)
            + struct.pack(">I", 12)
            + b"url "
            + b"\x00\x00\x00\x01",
        ),
    )
    sample_entry = (
        struct.pack(">I", 86)
        + b"jpeg"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data ref index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = full(
        b"stts", struct.pack(">III", 1, len(jpegs), 1)
    )
    stsc = full(
        b"stsc", struct.pack(">IIII", 1, 1, len(jpegs), 1)
    )  # one chunk holding every sample
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, len(jpegs))
        + struct.pack(f">{len(jpegs)}I", *map(len, jpegs)),
    )
    stco = full(b"stco", struct.pack(">II", 1, mdat_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
