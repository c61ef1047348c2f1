"""TIFF codec — baseline + PackBits decode, pure stdlib + the
EXIF module's IFD reader (TIFF *is* the container EXIF borrows).

Scanned-document corpora arrive as TIFF; the baseline profile every
writer supports (compression=1, strips, 8-bit grayscale or RGB)
decodes here end to end — header byte order (II/MM), IFD0 geometry
tags, MULTI-strip offsets/byte-counts concatenated in row order
(real scanner TIFFs set rows_per_strip < height; the IFD reader
returns the full SHORT/LONG value lists for count>1 tags). PackBits
(compression=32773 — the TIFF 6.0 §9 byte-oriented RLE, the common
fax/scan profile) and LZW (compression=5 — §13's MSB-first
variable-width codes with the early-change width rule, the common
desktop-writer profile) decompress per strip, and so does Deflate
(compression=8/32946 — the Adobe TIFF extension, stdlib zlib; new
r11) with the §14 horizontal-differencing predictor (tag 317 = 2,
undone row-wise with a modular cumsum; valid on LZW and Deflate).
New-style JPEG-in-TIFF (compression=7, TechNote 2 — each strip/tile
a JPEG stream, shared tables via the JPEGTables tag spliced after
SOI) routes to the in-repo ``operators/jpeg.py`` decoder, and the
§15 TILED layout (tags 322-325, edge tiles zero-padded, stitched
with per-tile predictor undo) decodes for every codec — both new
r11. Old-style JPEG (6), the floating-point predictor (3), and
non-8-bit samples raise the declared ``NotImplementedError``. The
writer emits spec-shaped baseline TIFFs for fixtures — single- or
multi-strip or tiled; uncompressed, PackBits, LZW, Deflate or
lossless-JPEG segments, predictor 1 or 2, optional shared
JPEGTables — so the decoders are pinned against
independently-written layouts.

Same scale shape as the other codecs: per-image byte walks inside
``mapInPandas`` (``multimodal._decode_bytes`` routes the II*/MM*
magic), executor-side, no shuffle.
"""

from __future__ import annotations

import struct
import zlib

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


def packbits_decode(data: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits RLE decode: control byte n in [0,127]
    copies n+1 literal bytes; n in [-127,-1] (two's complement)
    repeats the next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            j = i + c + 1
            if j > n:
                raise ValueError("PackBits literal run truncated")
            out += data[i:j]
            i = j
        elif c == 128:  # no-op
            continue
        else:  # replicate run of 257-c copies
            if i >= n:
                raise ValueError("PackBits replicate run truncated")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits encode (fixture writer): greedy run detection —
    replicate runs of >=2 identical bytes, literal runs otherwise,
    both capped at 128 per the spec."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW decode: MSB-first bit packing, 9→12-bit
    variable-width codes, ClearCode 256 / EOI 257, and the spec's
    EARLY CHANGE rule — the code width grows as soon as the next
    table slot reaches 2^width - 1 (one code earlier than GIF's
    LSB-first variant in ``operators/gif.py``)."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = pos = 0
    width = 9

    def next_code() -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return eoi  # truncated stream ends the scan
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        return (acc >> nbits) & ((1 << width) - 1)

    table: list[bytes] | None = None
    next_idx = 258
    prev: bytes | None = None
    while True:
        code = next_code()
        if code == eoi:
            break
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            next_idx = 258
            width = 9
            prev = None
            continue
        if table is None:
            raise ValueError("TIFF LZW stream must start with ClearCode")
        if prev is None:
            if code >= next_idx:
                raise ValueError("corrupt TIFF LZW stream")
            entry = table[code]
        else:
            if code < next_idx:
                entry = table[code]
            elif code == next_idx:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt TIFF LZW stream")
            table.append(prev + entry[:1])
            next_idx += 1
            if next_idx == (1 << width) - 1 and width < 12:
                width += 1  # the spec's early change
        out += entry
        prev = entry
    return bytes(out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encode (fixture writer) — greedy longest-match with
    the same MSB-first packing and early-change width rule the
    decoder implements; emits ClearCode when the table fills."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = 0
    width = 9

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    def reset() -> tuple[dict[bytes, int], int]:
        return {bytes([i]): i for i in range(256)}, 258

    put(clear)
    table, next_idx = reset()
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        put(table[run])
        table[cand] = next_idx
        next_idx += 1
        # the encoder's counter runs ONE ahead of the decoder's (it
        # adds an entry before emitting the next code, the decoder
        # after reading it), so the encoder bumps at 2^w where the
        # decoder bumps at 2^w - 1 — the libtiff maxcode asymmetry
        # that realizes the spec's early change
        if next_idx == (1 << width) and width < 12:
            width += 1
        if next_idx > 4093:  # table nearly full: clear per the spec
            put(clear)
            width = 9
            table, next_idx = reset()
        run = bytes([byte])
    if run:
        put(table[run])
    put(eoi)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _jpeg_with_tables(seg: bytes, tables: bytes | None) -> bytes:
    """Splice a JPEGTables (tag 347) stream's table segments into a
    strip/tile JPEG stream, per TIFF TechNote 2: the tables stream is
    SOI + DQT/DHT + EOI; its body goes right after the segment's own
    SOI so segment-local tables (appearing later) still override."""
    seg = bytes(seg)
    if seg[:2] != b"\xff\xd8":
        raise ValueError("JPEG-in-TIFF segment missing SOI")
    if not tables:
        return seg
    body = bytes(tables)
    if body[:2] == b"\xff\xd8":
        body = body[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    return seg[:2] + body + seg[2:]


def decode_tiff(b: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline TIFF (uncompressed, PackBits, LZW, Deflate
    or new-style JPEG-in-TIFF — with the horizontal-differencing
    predictor on LZW/Deflate; single-strip, multi-strip or TILED) to
    (width, height, RGB24). Grayscale (1 sample) replicates to RGB;
    RGB (3 samples) passes through. Old-style JPEG (6), the
    floating-point predictor, and non-8-bit samples raise
    NotImplementedError."""
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
    if comp not in (1, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp}: uncompressed (1), LZW (5), "
            "new-style JPEG (7), Deflate (8/32946) and PackBits "
            "(32773) decode here — old-style JPEG (6) is the "
            "deprecated TIFF 6.0 scheme TechNote 2 replaced"
        )
    pred = int(ifd.get(317, 1))
    if pred not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {pred}: only none (1) and horizontal "
            "differencing (2) are supported"
        )
    if pred == 2 and comp not in (5, 8, 32946):
        raise NotImplementedError(
            "TIFF predictor 2 is only defined for LZW/Deflate "
            f"compression (got compression {comp})"
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

    tiled = 322 in ifd or 324 in ifd
    if tiled:
        if not all(t in ifd for t in (322, 323, 324, 325)):
            raise ValueError(
                "tiled TIFF missing TileWidth/TileLength/TileOffsets/"
                "TileByteCounts"
            )
        tw, th = int(ifd[322]), int(ifd[323])
        if tw <= 0 or th <= 0:
            raise ValueError("TIFF tile dimensions must be positive")
        offs, counts = as_list(ifd[324]), as_list(ifd[325])
        ntx, nty = -(-w // tw), -(-h // th)
        if len(offs) < ntx * nty:
            raise ValueError("TIFF tile count short of the tile grid")
    else:
        if 273 not in ifd or 279 not in ifd:
            raise ValueError(
                "TIFF without strip or tile offsets"
            )
        offs, counts = as_list(ifd[273]), as_list(ifd[279])
    if len(offs) != len(counts):
        raise ValueError("TIFF offsets/byte-counts length mismatch")
    segs = [b[o : o + c] for o, c in zip(offs, counts)]
    if any(len(s) != c for s, c in zip(segs, counts)):
        raise ValueError("TIFF strip/tile extends past end of file")

    import numpy as np

    if comp == 7:
        # TechNote 2 new-style JPEG: every strip/tile is a JPEG
        # stream; shared DQT/DHT may live in the JPEGTables tag
        # (347), spliced in after each segment's SOI. The in-repo
        # baseline/progressive/lossless decoder handles the streams.
        from .jpeg import decode_jpeg

        tables = ifd.get(347)
        out = np.zeros((h, w, 3), np.uint8)
        if tiled:
            for idx in range(ntx * nty):
                ty, tx = divmod(idx, ntx)
                sw, sh, srgb = decode_jpeg(
                    _jpeg_with_tables(segs[idx], tables)
                )
                tile = np.frombuffer(srgb, np.uint8).reshape(sh, sw, 3)
                y0, x0 = ty * th, tx * tw
                ys, xs = min(th, h - y0), min(tw, w - x0)
                if sh < ys or sw < xs:
                    raise ValueError(
                        "JPEG tile smaller than the tile grid cell"
                    )
                out[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
        else:
            rps = int(ifd.get(278, h))
            y0 = 0
            for seg in segs:
                if y0 >= h:
                    break
                sw, sh, srgb = decode_jpeg(
                    _jpeg_with_tables(seg, tables)
                )
                strip = np.frombuffer(srgb, np.uint8).reshape(sh, sw, 3)
                ys = min(rps, h - y0)
                if sh < ys or sw < w:
                    raise ValueError(
                        "JPEG strip smaller than its strip rows"
                    )
                out[y0 : y0 + ys, :, :] = strip[:ys, :w]
                y0 += ys
            if y0 < h:
                raise ValueError("TIFF JPEG strips truncated")
        return w, h, out.tobytes()

    if comp == 32773:
        segs = [packbits_decode(s) for s in segs]
    elif comp == 5:
        segs = [tiff_lzw_decode(s) for s in segs]
    elif comp in (8, 32946):
        segs = [zlib.decompress(s) for s in segs]
    if tiled:
        # tiles are FULL tw x th blocks (edges zero-padded by the
        # writer, spec §15); predictor rows run the tile width, so
        # undo per tile BEFORE cropping into place
        out = np.zeros((h, w, spp), np.uint8)
        tbytes = tw * th * spp
        for idx in range(ntx * nty):
            seg = segs[idx]
            if len(seg) < tbytes:
                raise ValueError("TIFF tile data truncated")
            tile = np.frombuffer(seg[:tbytes], np.uint8).reshape(
                th, tw, spp
            )
            if pred == 2:
                tile = np.cumsum(tile, axis=1, dtype=np.uint8)
            ty, tx = divmod(idx, ntx)
            y0, x0 = ty * th, tx * tw
            ys, xs = min(th, h - y0), min(tw, w - x0)
            out[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
        raw = out.tobytes()
    else:
        raw = b"".join(segs)
        need = w * h * spp
        if len(raw) < need:
            raise ValueError("TIFF strip data truncated")
        raw = raw[:need]
        if pred == 2:
            # §14 horizontal differencing: each sample stored as the
            # delta from the previous pixel's same sample, reset per
            # row — undo with a modular cumsum along the row axis
            # (strips hold whole rows, so row boundaries survive the
            # concat)
            arr = np.frombuffer(raw, np.uint8).reshape(h, w, spp)
            raw = np.cumsum(arr, axis=1, dtype=np.uint8).tobytes()
    if spp == 3:
        return w, h, raw
    rgb = bytearray(w * h * 3)
    rgb[0::3] = raw
    rgb[1::3] = raw
    rgb[2::3] = raw
    return w, h, bytes(rgb)


def encode_tiff(
    width: int,
    height: int,
    rgb: bytes,
    rows_per_strip: int | None = None,
    compression: str = "none",
    predictor: int = 1,
    tile_size: tuple[int, int] | None = None,
    jpeg_tables: bool = False,
) -> bytes:
    """Fixture writer: little-endian spec-shaped RGB TIFF. Default is
    the original single-strip uncompressed layout (byte-exact round
    trip); ``rows_per_strip`` splits the pixel data into the
    real-scanner multi-strip layout (count>1 StripOffsets /
    StripByteCounts, out-of-line LONG arrays);
    ``compression='packbits'`` (tag 32773), ``'lzw'`` (tag 5),
    ``'deflate'`` (tag 8, new r11) or ``'jpeg'`` (tag 7, new r11 —
    each segment a LOSSLESS SOF3 stream so any pixel data round
    trips byte-exactly) compresses each segment; ``predictor=2``
    (LZW/Deflate only) applies \u00a714 horizontal differencing before
    compression and writes tag 317; ``tile_size=(tw, th)`` (new r11)
    writes the \u00a715 TILED layout (tags 322-325, edge tiles
    zero-padded to full size); ``jpeg_tables=True`` moves the JPEG
    segments' shared Huffman tables into the JPEGTables tag (347),
    the TechNote 2 shared-tables shape."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    if compression not in ("none", "packbits", "lzw", "deflate", "jpeg"):
        raise ValueError(
            "compression must be 'none', 'packbits', 'lzw', "
            "'deflate' or 'jpeg'"
        )
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    if predictor == 2 and compression not in ("lzw", "deflate"):
        raise ValueError("predictor 2 needs lzw or deflate")
    if jpeg_tables and compression != "jpeg":
        raise ValueError("jpeg_tables needs compression='jpeg'")
    if tile_size is not None and rows_per_strip is not None:
        raise ValueError("tile_size and rows_per_strip are exclusive")

    import numpy as np

    px = np.frombuffer(bytes(rgb), np.uint8).reshape(height, width, 3)

    def _diff(block: "np.ndarray") -> "np.ndarray":
        if predictor != 2:
            return block
        d = block.copy()
        d[:, 1:, :] -= block[:, :-1, :]  # wraps mod 256
        return d

    # (block_w, block_h, pixel bytes) per segment, tile-grid or strips
    blocks: list[tuple[int, int, "np.ndarray"]] = []
    if tile_size is not None:
        tw, th = tile_size
        if tw <= 0 or th <= 0:
            raise ValueError("tile dimensions must be positive")
        ntx, nty = -(-width // tw), -(-height // th)
        for ty in range(nty):
            for tx in range(ntx):
                tile = np.zeros((th, tw, 3), np.uint8)
                ys = min(th, height - ty * th)
                xs = min(tw, width - tx * tw)
                tile[:ys, :xs] = px[
                    ty * th : ty * th + ys, tx * tw : tx * tw + xs
                ]
                blocks.append((tw, th, _diff(tile)))
    else:
        rps = height if rows_per_strip is None else min(
            rows_per_strip, height
        )
        if rps <= 0:
            raise ValueError("rows_per_strip must be positive")
        for r in range(0, height, rps):
            strip = px[r : r + rps]
            blocks.append((width, strip.shape[0], _diff(strip)))

    tables_blob = b""
    if compression == "packbits":
        segs = [packbits_encode(blk.tobytes()) for _w, _h, blk in blocks]
    elif compression == "lzw":
        segs = [tiff_lzw_encode(blk.tobytes()) for _w, _h, blk in blocks]
    elif compression == "deflate":
        segs = [zlib.compress(blk.tobytes(), 6) for _w, _h, blk in blocks]
    elif compression == "jpeg":
        from .jpeg import encode_jpeg_lossless

        segs = [
            encode_jpeg_lossless(bw, bh, blk.tobytes())
            for bw, bh, blk in blocks
        ]
        if jpeg_tables:
            stripped = []
            dht = b""
            for s in segs:
                body, dht = _extract_jpeg_dht(s)
                stripped.append(body)
            segs = stripped
            tables_blob = b"\xff\xd8" + dht + b"\xff\xd9"
    else:
        segs = [blk.tobytes() for _w, _h, blk in blocks]
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773,
                "deflate": 8, "jpeg": 7}[compression]
    n_segs = len(segs)

    seg_off0 = 8
    data_len = sum(len(s) for s in segs)
    ifd_off = seg_off0 + data_len
    offs = []
    pos = seg_off0
    for s in segs:
        offs.append(pos)
        pos += len(s)
    counts = [len(s) for s in segs]

    entries = [
        (256, 3, 1, width),  # ImageWidth SHORT
        (257, 3, 1, height),  # ImageLength
        (258, 3, 3, None),  # BitsPerSample -> out-of-line (8,8,8)
        (259, 3, 1, comp_tag),  # Compression
        (262, 3, 1, 2),  # Photometric = RGB
    ]
    if tile_size is None:
        rps = height if rows_per_strip is None else min(
            rows_per_strip, height
        )
        entries += [
            (273, 4, n_segs, None),  # StripOffsets (inline iff 1)
            (277, 3, 1, 3),  # SamplesPerPixel
            (278, 3, 1, rps),  # RowsPerStrip
            (279, 4, n_segs, None),  # StripByteCounts
        ]
    else:
        entries.append((277, 3, 1, 3))  # SamplesPerPixel
    if predictor == 2:
        entries.append((317, 3, 1, 2))  # Predictor = horizontal
    if tile_size is not None:
        tw, th = tile_size
        entries += [
            (322, 3, 1, tw),  # TileWidth
            (323, 3, 1, th),  # TileLength
            (324, 4, n_segs, None),  # TileOffsets
            (325, 4, n_segs, None),  # TileByteCounts
        ]
    if tables_blob:
        entries.append((347, 7, len(tables_blob), None))  # JPEGTables
    # out-of-line area starts after the IFD (entry table + next ptr)
    blob_off = ifd_off + 2 + 12 * len(entries) + 4
    blobs = bytearray()

    def blob(raw: bytes) -> int:
        nonlocal blob_off
        o = blob_off
        blobs.extend(raw)
        blob_off += len(raw)
        return o

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    for s in segs:
        out += s
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack("<HHI", tag, typ, count)
        if tag == 258:
            out += struct.pack(
                "<I", blob(struct.pack("<HHH", 8, 8, 8))
            )
        elif tag in (273, 279, 324, 325):
            vals = offs if tag in (273, 324) else counts
            if n_segs == 1:
                out += struct.pack("<I", vals[0])
            else:
                out += struct.pack(
                    "<I",
                    blob(struct.pack(f"<{n_segs}I", *vals)),
                )
        elif tag == 347:
            if len(tables_blob) <= 4:
                out += tables_blob.ljust(4, b"\x00")
            else:
                out += struct.pack("<I", blob(tables_blob))
        elif typ == 3:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += blobs
    return bytes(out)


def _extract_jpeg_dht(stream: bytes) -> tuple[bytes, bytes]:
    """(stream without its DHT segments, the DHT segment bytes) — the
    fixture-side split that moves shared Huffman tables into the
    JPEGTables tag. Walks marker segments from SOI to SOS."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    out = bytearray(stream[:2])
    dht = bytearray()
    i = 2
    while i + 4 <= len(stream):
        if stream[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = stream[i + 1]
        if marker == 0xD9:  # EOI
            out += stream[i:]
            break
        (seglen,) = struct.unpack_from(">H", stream, i + 2)
        seg = stream[i : i + 2 + seglen]
        if marker == 0xC4:  # DHT -> tables stream
            dht += seg
        else:
            out += seg
        if marker == 0xDA:  # SOS: entropy data follows verbatim
            out += stream[i + 2 + seglen :]
            break
        i += 2 + seglen
    return bytes(out), bytes(dht)
