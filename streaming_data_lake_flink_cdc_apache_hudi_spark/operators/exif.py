"""EXIF metadata codec — JPEG APP1 / TIFF-IFD parse, pure stdlib.

Training-data pipelines read EXIF for provenance (capture time,
camera), dedup hints, and PII stripping (GPS) — and they must do it
WITHOUT decoding pixels. This module parses the public EXIF layout:
a JPEG ``APP1`` segment tagged ``Exif\\0\\0`` containing a TIFF
structure (``II``/``MM`` byte order, linked IFDs of 12-byte entries:
tag, type, count, inline-value-or-offset), with the Exif sub-IFD
(tag 0x8769) and GPS sub-IFD (tag 0x8825) followed. Rationals decode
to floats; GPS coordinates resolve to signed decimal degrees from the
D/M/S rational triplets + N/S/E/W refs.

The writer emits a spec-shaped APP1 for fixtures (both byte orders),
so the parser is pinned against an independently-written encoding.
``strip_exif`` removes APP1 — the PII-scrub operation — leaving the
entropy stream untouched (the image still decodes identically).

Scale shape: header-only byte walks inside ``mapInPandas``
(``multimodal`` wiring) — no pixel decode, KB of reads per image.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
}
_EXIF_TAGS = {
    0x9003: "datetime_original",
    0xA002: "pixel_x",
    0xA003: "pixel_y",
    0x8827: "iso",
}


def _read_ifd(b: bytes, off: int, bo: str) -> dict[int, object]:
    """One IFD -> {tag: decoded value}. Multi-count numeric fields
    (SHORT/LONG/SLONG and rationals) decode to the FULL value list
    (scalar when count==1) — TIFF strip geometry (StripOffsets /
    StripByteCounts with count>1) depends on this; ASCII decodes to
    the full NUL-terminated string."""
    out: dict[int, object] = {}
    if off + 2 > len(b):
        raise ValueError("EXIF IFD offset out of range")
    (n,) = struct.unpack_from(bo + "H", b, off)
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", b, e)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip, per the spec's guidance
        total = size * count
        voff = (
            e + 8
            if total <= 4
            else struct.unpack_from(bo + "I", b, e + 8)[0]
        )
        raw = b[voff : voff + total]
        if len(raw) < total:
            raise ValueError(f"EXIF tag 0x{tag:04X} value out of range")
        if typ == 2:  # ASCII, NUL-terminated
            out[tag] = raw.split(b"\x00")[0].decode("latin1")
        elif typ in (5, 10):  # (S)RATIONAL list
            fmt = "ii" if typ == 10 else "II"
            vals = []
            for k in range(count):
                num, den = struct.unpack_from(bo + fmt, raw, 8 * k)
                vals.append(num / den if den else float("nan"))
            out[tag] = vals if count > 1 else vals[0]
        elif typ in (3, 4, 9):
            fmt = {3: "H", 4: "I", 9: "i"}[typ]
            vals = [
                struct.unpack_from(bo + fmt, raw, size * k)[0]
                for k in range(count)
            ]
            out[tag] = vals if count > 1 else vals[0]
        else:  # BYTE / UNDEFINED
            out[tag] = bytes(raw)
    return out


def parse_exif(jpeg: bytes) -> dict:
    """Extract EXIF metadata from a JPEG's APP1 segment.

    Returns a dict with ``make``, ``model``, ``orientation``,
    ``datetime``, ``datetime_original``, ``pixel_x``, ``pixel_y``,
    ``iso``, ``gps_lat``, ``gps_lon`` (absent keys = not present).
    Raises ``ValueError`` when there is no EXIF APP1 — callers treat
    that as "no metadata", not corruption."""
    jpeg = bytes(jpeg)
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    tiff = None
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # scan data: no more headers
            break
        size = int.from_bytes(jpeg[pos + 2 : pos + 4], "big")
        body = jpeg[pos + 4 : pos + 2 + size]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + size
    if tiff is None:
        raise ValueError("JPEG carries no EXIF APP1 segment")
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("EXIF TIFF header has unknown byte order")
    magic, ifd0_off = struct.unpack_from(bo + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("EXIF TIFF magic != 42")
    ifd0 = _read_ifd(tiff, ifd0_off, bo)
    out: dict = {}
    for tag, name in _IFD0_TAGS.items():
        if tag in ifd0:
            out[name] = ifd0[tag]
    if 0x8769 in ifd0:  # Exif sub-IFD
        sub = _read_ifd(tiff, int(ifd0[0x8769]), bo)
        for tag, name in _EXIF_TAGS.items():
            if tag in sub:
                out[name] = sub[tag]
    if 0x8825 in ifd0:  # GPS sub-IFD
        gps = _read_ifd(tiff, int(ifd0[0x8825]), bo)

        def dms(vals, ref, neg):
            d, m, s = (vals + [0, 0, 0])[:3] if isinstance(
                vals, list
            ) else (vals, 0, 0)
            v = d + m / 60 + s / 3600
            return -v if ref in neg else v

        if 2 in gps and 1 in gps:
            out["gps_lat"] = round(dms(gps[2], gps[1], ("S",)), 6)
        if 4 in gps and 3 in gps:
            out["gps_lon"] = round(dms(gps[4], gps[3], ("W",)), 6)
    return out


def strip_exif(jpeg: bytes) -> bytes:
    """Drop EXIF APP1 segments (the GPS/PII scrub) — every other byte
    of the file, including the entropy stream, is preserved."""
    jpeg = bytes(jpeg)
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    out = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            out += jpeg[pos : pos + 2]
            pos += 2
            continue
        if marker == 0xDA:
            break
        size = int.from_bytes(jpeg[pos + 2 : pos + 4], "big")
        seg = jpeg[pos : pos + 2 + size]
        if not (
            marker == 0xE1 and seg[4:10] == b"Exif\x00\x00"
        ):
            out += seg
        pos += 2 + size
    out += jpeg[pos:]
    return bytes(out)


def make_exif_app1(
    make: str = "",
    model: str = "",
    orientation: int | None = None,
    datetime: str = "",
    datetime_original: str = "",
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    iso: int | None = None,
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Build a spec-shaped EXIF APP1 segment (fixture writer, both
    byte orders) for insertion right after SOI."""
    bo = "<" if byte_order == "II" else ">"
    blobs = bytearray()  # out-of-line values, offsets fixed later
    entries0: list[tuple] = []
    entries_exif: list[tuple] = []
    entries_gps: list[tuple] = []

    def ascii_entry(entries, tag, s):
        raw = s.encode("latin1") + b"\x00"
        entries.append((tag, 2, len(raw), raw))

    def short_entry(entries, tag, v):
        entries.append((tag, 3, 1, struct.pack(bo + "H", v)))

    def long_entry(entries, tag, v):
        entries.append((tag, 4, 1, struct.pack(bo + "I", v)))

    def rat3_entry(entries, tag, d, m, s):
        raw = struct.pack(
            bo + "IIIIII", d, 1, m, 1, int(round(s * 10000)), 10000
        )
        entries.append((tag, 5, 3, raw))

    if make:
        ascii_entry(entries0, 0x010F, make)
    if model:
        ascii_entry(entries0, 0x0110, model)
    if orientation is not None:
        short_entry(entries0, 0x0112, orientation)
    if datetime:
        ascii_entry(entries0, 0x0132, datetime)
    if datetime_original:
        ascii_entry(entries_exif, 0x9003, datetime_original)
    if pixel_x is not None:
        long_entry(entries_exif, 0xA002, pixel_x)
    if pixel_y is not None:
        long_entry(entries_exif, 0xA003, pixel_y)
    if iso is not None:
        short_entry(entries_exif, 0x8827, iso)
    if gps is not None:
        lat, lon = gps
        ascii_entry(entries_gps, 1, "S" if lat < 0 else "N")
        d = abs(lat)
        rat3_entry(
            entries_gps, 2, int(d), int(d * 60) % 60, (d * 3600) % 60
        )
        ascii_entry(entries_gps, 3, "W" if lon < 0 else "E")
        d = abs(lon)
        rat3_entry(
            entries_gps, 4, int(d), int(d * 60) % 60, (d * 3600) % 60
        )

    # layout: header(8) IFD0 [ExifIFD] [GPSIFD] blobs
    n0 = len(entries0) + (1 if entries_exif else 0) + (
        1 if entries_gps else 0
    )
    ifd0_off = 8
    exif_off = ifd0_off + 2 + 12 * n0 + 4
    gps_off = exif_off + (
        2 + 12 * len(entries_exif) + 4 if entries_exif else 0
    )
    blob_off = gps_off + (
        2 + 12 * len(entries_gps) + 4 if entries_gps else 0
    )

    def render(entries, extra: list[tuple]) -> bytes:
        nonlocal blob_off
        all_e = sorted(entries + extra)
        out = struct.pack(bo + "H", len(all_e))
        for tag, typ, count, raw in all_e:
            out += struct.pack(bo + "HHI", tag, typ, count)
            if len(raw) <= 4:
                out += raw + b"\x00" * (4 - len(raw))
            else:
                out += struct.pack(bo + "I", blob_off)
                blobs.extend(raw)
                blob_off += len(raw)
        return out + struct.pack(bo + "I", 0)  # no next IFD

    extra0 = []
    if entries_exif:
        extra0.append((0x8769, 4, 1, struct.pack(bo + "I", exif_off)))
    if entries_gps:
        extra0.append((0x8825, 4, 1, struct.pack(bo + "I", gps_off)))
    tiff = bytearray()
    tiff += byte_order.encode() + struct.pack(bo + "HI", 42, ifd0_off)
    tiff += render(entries0, extra0)
    if entries_exif:
        tiff += render(entries_exif, [])
    if entries_gps:
        tiff += render(entries_gps, [])
    tiff += blobs
    body = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (fixture helper)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]
