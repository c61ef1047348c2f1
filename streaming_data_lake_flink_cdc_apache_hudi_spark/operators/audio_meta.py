"""Audio container metadata — MP3 (ID3v2 + MPEG frame walk) and FLAC
(STREAMINFO), pure stdlib, public specs.

The audio counterpart of ``operators/mp4.py``'s metadata-first
stance: a corpus pipeline needs duration / rate / channels / tags for
routing, budgeting, and dedup WITHOUT decoding perceptual audio
(MP3's MDCT+huffman and FLAC's LPC stay the declared external
boundary — ``multimodal._decode_bytes`` reports metadata with a null
feature for these).

- MP3: ID3v2 header + frames (the public id3.org layout: 10-byte
  header with syncsafe size, TIT2/TPE1/TALB text frames), then the
  MPEG audio frame-header walk — 11-bit sync, version/layer, bitrate
  and sample-rate tables from the MPEG-1/2 spec, padding — counting
  frames for an exact duration (frames x samples_per_frame / rate)
  and detecting CBR vs VBR from the bitrate-index spread.
- FLAC: ``fLaC`` magic + METADATA_BLOCK_STREAMINFO (bit-packed
  sample rate / channels / bits / total samples) and the
  VORBIS_COMMENT block's key=value tags.

Everything is a header/frame-boundary byte walk: KB of reads per
file, mapInPandas executor-side, no entropy decode anywhere.
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III bitrate table (kbps, index 1..14) and sample rates
_BITRATES_V1L3 = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
    320,
]
_BITRATES_V2L3 = [
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
          0: [11025, 12000, 8000]}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def parse_id3v2(b: bytes) -> tuple[dict, int]:
    """ID3v2 tag at the file head -> ({tag: text}, audio_offset)."""
    if b[:3] != b"ID3":
        return {}, 0
    size = _syncsafe(b[6:10])
    end = 10 + size
    tags: dict[str, str] = {}
    pos = 10
    ver = b[3]
    while pos + 10 <= end:
        fid = b[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        fsize = (
            _syncsafe(b[pos + 4 : pos + 8])
            if ver >= 4
            else int.from_bytes(b[pos + 4 : pos + 8], "big")
        )
        body = b[pos + 10 : pos + 10 + fsize]
        if fid.startswith(b"T") and body:
            enc = body[0]
            text = body[1:]
            if enc == 0:
                val = text.decode("latin1", "replace")
            elif enc == 1:
                val = text.decode("utf-16", "replace")
            elif enc == 3:
                val = text.decode("utf-8", "replace")
            else:
                val = text.decode("utf-16-be", "replace")
            tags[fid.decode("latin1")] = val.rstrip("\x00")
        pos += 10 + fsize
    return tags, end


def parse_mp3(b: bytes) -> dict:
    """MP3 metadata: ID3v2 tags + an exact frame walk.

    Returns ``{"title", "artist", "album", "sample_rate", "channels",
    "n_frames", "duration_ms", "bitrate_kbps" (mean), "vbr"}``.
    Raises ``ValueError`` when no MPEG frame sync is found."""
    b = bytes(b)
    tags, pos = parse_id3v2(b)
    n_frames = 0
    total_bytes = 0
    rate = None
    channels = None
    bitrates = set()
    samples_per_frame = 1152
    while pos + 4 <= len(b):
        if b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
            if n_frames:
                break  # trailing junk / ID3v1 after the last frame
            pos += 1
            continue
        h = struct.unpack_from(">I", b, pos)[0]
        version = (h >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (h >> 17) & 3  # 1 = Layer III
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        if version == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
            if n_frames:
                break
            pos += 1
            continue
        table = _BITRATES_V1L3 if version == 3 else _BITRATES_V2L3
        br = table[br_idx]
        sr = _RATES[version][sr_idx]
        samples_per_frame = 1152 if version == 3 else 576
        flen = samples_per_frame * br * 1000 // 8 // sr + padding
        rate = sr
        channels = 1 if mode == 3 else 2
        bitrates.add(br)
        n_frames += 1
        total_bytes += flen
        pos += flen
    if not n_frames or rate is None:
        raise ValueError("no MPEG audio frames found")
    return {
        "title": tags.get("TIT2"),
        "artist": tags.get("TPE1"),
        "album": tags.get("TALB"),
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * samples_per_frame * 1000 // rate,
        "bitrate_kbps": total_bytes * 8 * rate
        // (n_frames * samples_per_frame) // 1000,
        "vbr": len(bitrates) > 1,
    }


def encode_mp3_silence(
    n_frames: int = 20,
    sample_rate: int = 44100,
    bitrate: int = 128,
    tags: dict | None = None,
) -> bytes:
    """Fixture writer: a syntactically-valid CBR MPEG-1 Layer III
    stream of empty (zero-payload) frames behind an optional ID3v2.3
    tag — enough structure to pin the frame walk; the frames carry no
    decodable audio (this module never decodes audio anyway)."""
    out = bytearray()
    if tags:
        frames = bytearray()
        for fid, text in tags.items():
            body = b"\x00" + text.encode("latin1")
            frames += fid.encode() + struct.pack(">I", len(body))
            frames += b"\x00\x00" + body
        out += b"ID3\x03\x00\x00" + bytes(
            [
                (len(frames) >> 21) & 0x7F,
                (len(frames) >> 14) & 0x7F,
                (len(frames) >> 7) & 0x7F,
                len(frames) & 0x7F,
            ]
        )
        out += frames
    br_idx = _BITRATES_V1L3.index(bitrate)
    sr_idx = _RATES[3].index(sample_rate)
    h = (
        (0x7FF << 21)
        | (3 << 19)  # MPEG-1
        | (1 << 17)  # Layer III
        | (1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (0 << 9)  # no padding
        | (0 << 6)  # stereo
    )
    flen = 1152 * bitrate * 1000 // 8 // sample_rate
    frame = struct.pack(">I", h) + b"\x00" * (flen - 4)
    out += frame * n_frames
    return bytes(out)


def parse_flac(b: bytes) -> dict:
    """FLAC STREAMINFO + VORBIS_COMMENT: rate, channels, bit depth,
    total samples, duration, and key=value tags."""
    b = bytes(b)
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    tags: dict[str, str] = {}
    while pos + 4 <= len(b):
        hdr = b[pos]
        btype = hdr & 0x7F
        size = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body = b[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            bits = int.from_bytes(body[10:18], "big")
            info = {
                "sample_rate": (bits >> 44) & 0xFFFFF,
                "channels": ((bits >> 41) & 0x7) + 1,
                "bits_per_sample": ((bits >> 36) & 0x1F) + 1,
                "total_samples": bits & ((1 << 36) - 1),
            }
        elif btype == 4:  # VORBIS_COMMENT (little-endian lengths)
            vlen = int.from_bytes(body[0:4], "little")
            p = 4 + vlen
            n = int.from_bytes(body[p : p + 4], "little")
            p += 4
            for _ in range(n):
                ln = int.from_bytes(body[p : p + 4], "little")
                kv = body[p + 4 : p + 4 + ln].decode("utf-8", "replace")
                p += 4 + ln
                if "=" in kv:
                    k, _, v = kv.partition("=")
                    tags[k.upper()] = v
        pos += 4 + size
        if hdr & 0x80:  # last-metadata-block flag
            break
    if info is None:
        raise ValueError("FLAC has no STREAMINFO block")
    sr = info["sample_rate"]
    return {
        **info,
        "duration_ms": (
            info["total_samples"] * 1000 // sr if sr else None
        ),
        "tags": tags,
    }


def encode_flac_headers(
    sample_rate: int = 44100,
    channels: int = 2,
    bits: int = 16,
    total_samples: int = 441000,
    tags: dict | None = None,
) -> bytes:
    """Fixture writer: fLaC magic + STREAMINFO (+ VORBIS_COMMENT) —
    metadata blocks only, no audio frames (this module never decodes
    them)."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total_samples
    )
    si = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize (2+2)
        + b"\x00" * 6  # min/max framesize (3+3, unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5
    )
    assert len(si) == 34  # STREAMINFO body size per spec
    out = bytearray(b"fLaC")
    blocks = [(0, si)]
    if tags:
        body = struct.pack("<I", 4) + b"ref\x00"
        body += struct.pack("<I", len(tags))
        for k, v in tags.items():
            kv = f"{k}={v}".encode()
            body += struct.pack("<I", len(kv)) + kv
        blocks.append((4, body))
    for i, (btype, body) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out += bytes([last | btype]) + len(body).to_bytes(3, "big")
        out += body
    return bytes(out)


def parse_ogg(b: bytes) -> dict:
    """Ogg container metadata (new r9): page walk (``OggS`` capture
    pattern, segment lacing) + the first packet's codec id header —
    ``OpusHead`` (channels, pre-skip, input sample rate) or the
    Vorbis identification header (channels, rate). Duration comes
    from the LAST page's granule position per each codec's rule
    (Opus: 48 kHz samples minus pre-skip; Vorbis: PCM samples at the
    stream rate). Entropy decode stays external — this is the same
    metadata-only stance as MP3/FLAC."""
    b = bytes(b)
    if b[:4] != b"OggS":
        raise ValueError("not an Ogg payload")
    first_packet = None
    last_granule = 0
    pos = 0
    while pos + 27 <= len(b):
        if b[pos : pos + 4] != b"OggS":
            break
        granule = int.from_bytes(
            b[pos + 6 : pos + 14], "little", signed=True
        )
        nsegs = b[pos + 26]
        lacing = b[pos + 27 : pos + 27 + nsegs]
        body_start = pos + 27 + nsegs
        body_len = sum(lacing)
        if first_packet is None:
            first_packet = b[body_start : body_start + body_len]
        if granule > 0:
            last_granule = max(last_granule, granule)
        pos = body_start + body_len
    if first_packet is None:
        raise ValueError("Ogg has no pages")
    if first_packet[:8] == b"OpusHead":
        channels = first_packet[9]
        pre_skip = int.from_bytes(first_packet[10:12], "little")
        input_rate = int.from_bytes(first_packet[12:16], "little")
        dur = max(0, last_granule - pre_skip) * 1000 // 48000
        return {
            "codec": "opus",
            "channels": channels,
            "sample_rate": input_rate,
            "pre_skip": pre_skip,
            "duration_ms": dur if last_granule else None,
        }
    if first_packet[:7] == b"\x01vorbis":
        channels = first_packet[11]
        rate = int.from_bytes(first_packet[12:16], "little")
        return {
            "codec": "vorbis",
            "channels": channels,
            "sample_rate": rate,
            "pre_skip": 0,
            "duration_ms": (
                last_granule * 1000 // rate if rate and last_granule
                else None
            ),
        }
    raise NotImplementedError(
        f"Ogg codec id {first_packet[:8]!r}: OpusHead and Vorbis "
        "identification headers parse here"
    )


def encode_ogg_opus_headers(
    channels: int = 2,
    input_rate: int = 48000,
    pre_skip: int = 312,
    total_samples_48k: int = 96000,
) -> bytes:
    """Fixture writer: a minimal two-page Ogg stream — page 0 carries
    OpusHead, a final page carries the closing granule position —
    enough structure to pin the page walk and duration math."""
    import struct as _s
    import zlib as _z

    def page(granule: int, seq: int, body: bytes, flags: int) -> bytes:
        lacing = []
        n = len(body)
        while True:
            lacing.append(min(n, 255))
            n -= lacing[-1]
            if lacing[-1] < 255:
                break
        hdr = (
            b"OggS" + bytes([0, flags])
            + _s.pack("<q", granule)
            + _s.pack("<I", 1)  # serial
            + _s.pack("<I", seq)
            + b"\x00\x00\x00\x00"  # crc placeholder
            + bytes([len(lacing)]) + bytes(lacing)
        )
        raw = hdr + body
        crc = _z.crc32(raw)  # placeholder checksum (not the Ogg poly)
        return raw[:22] + _s.pack("<I", crc & 0xFFFFFFFF) + raw[26:]

    head = (
        b"OpusHead" + bytes([1, channels])
        + _s.pack("<H", pre_skip)
        + _s.pack("<I", input_rate)
        + _s.pack("<h", 0) + bytes([0])
    )
    return page(0, 0, head, 2) + page(
        total_samples_48k + pre_skip, 1, b"\x00", 4
    )
