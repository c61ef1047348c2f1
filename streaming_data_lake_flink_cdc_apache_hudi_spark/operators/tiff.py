"""TIFF codec — baseline uncompressed decode, pure stdlib + the
EXIF module's IFD reader (TIFF *is* the container EXIF borrows).

Scanned-document corpora arrive as TIFF; the baseline profile every
writer supports (compression=1, strips, 8-bit grayscale or RGB)
decodes here end to end — header byte order (II/MM), IFD0 geometry
tags, strip offsets/byte-counts concatenated in row order. LZW/
PackBits/JPEG-in-TIFF compression and tiled layouts raise the
declared ``NotImplementedError``. The writer emits a spec-shaped
single-strip baseline TIFF for fixtures.

Same scale shape as the other codecs: per-image byte walks inside
``mapInPandas`` (``multimodal._decode_bytes`` routes the II*/MM*
magic), executor-side, no shuffle.
"""

from __future__ import annotations

import struct

from .exif import _read_ifd

_TAGS = {
    256: "width",
    257: "height",
    258: "bits_per_sample",
    259: "compression",
    262: "photometric",
    273: "strip_offsets",
    277: "samples_per_pixel",
    278: "rows_per_strip",
    279: "strip_byte_counts",
}


def decode_tiff(b: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline uncompressed TIFF to (width, height, RGB24).
    Grayscale (1 sample) replicates to RGB; RGB (3 samples) passes
    through. Compressed or tiled files raise NotImplementedError."""
    b = bytes(b)
    if b[:4] == b"II*\x00":
        bo = "<"
    elif b[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd0_off,) = struct.unpack_from(bo + "I", b, 4)
    ifd = _read_ifd(b, ifd0_off, bo)
    w = int(ifd.get(256, 0))
    h = int(ifd.get(257, 0))
    if not w or not h:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    comp = int(ifd.get(259, 1))
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp}: only baseline uncompressed "
            "(1) decodes here — LZW/PackBits/JPEG-in-TIFF need an "
            "external decoder"
        )
    if 273 not in ifd or 279 not in ifd:
        raise NotImplementedError(
            "TIFF without strip offsets (tiled layout?) is not "
            "supported"
        )
    spp = int(ifd.get(277, 1))
    bps = ifd.get(258, 8)
    if isinstance(bps, (list, tuple)):
        bps = bps[0]
    if isinstance(bps, bytes):
        bps = bps[0]
    if int(bps) != 8 or spp not in (1, 3):
        raise NotImplementedError(
            f"TIFF bits={bps} samples={spp}: 8-bit gray/RGB only"
        )

    def as_list(v):
        return list(v) if isinstance(v, (list, tuple)) else [int(v)]

    offs = as_list(ifd[273])
    counts = as_list(ifd[279])
    raw = b"".join(
        b[o : o + c] for o, c in zip(offs, counts)
    )
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("TIFF strip data truncated")
    raw = raw[:need]
    if spp == 3:
        return w, h, raw
    rgb = bytearray(w * h * 3)
    rgb[0::3] = raw
    rgb[1::3] = raw
    rgb[2::3] = raw
    return w, h, bytes(rgb)


def encode_tiff(width: int, height: int, rgb: bytes) -> bytes:
    """Fixture writer: little-endian single-strip uncompressed RGB
    TIFF (header + pixel strip + IFD), byte-exact round trip."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    strip_off = 8
    ifd_off = strip_off + len(rgb)
    entries = [
        (256, 3, 1, width),  # ImageWidth SHORT
        (257, 3, 1, height),  # ImageLength
        (258, 3, 3, None),  # BitsPerSample -> out-of-line (8,8,8)
        (259, 3, 1, 1),  # Compression = none
        (262, 3, 1, 2),  # Photometric = RGB
        (273, 4, 1, strip_off),  # StripOffsets
        (277, 3, 1, 3),  # SamplesPerPixel
        (278, 3, 1, height),  # RowsPerStrip
        (279, 4, 1, len(rgb)),  # StripByteCounts
    ]
    bps_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += rgb
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack("<HHI", tag, typ, count)
        if tag == 258:
            out += struct.pack("<I", bps_off)
        elif typ == 3:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<HHH", 8, 8, 8)  # BitsPerSample values
    return bytes(out)
