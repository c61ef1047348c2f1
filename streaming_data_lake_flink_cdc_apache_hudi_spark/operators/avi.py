"""AVI (RIFF) MJPEG video-container codec — pure Python, public spec.

Closes most of the remaining multimodal "video container" stub
(``operators/multimodal.py``): an AVI file carrying an MJPG video
stream now decodes FOR REAL in-container. The container layout
follows the public Microsoft *AVI RIFF File Reference* (RIFF 'AVI '
-> LIST 'hdrl' [avih + LIST 'strl' [strh + strf]] -> LIST 'movi'
['00dc' frame chunks] -> 'idx1'); each frame payload is a baseline
JPEG decoded by ``operators/jpeg.py`` (ITU T.81). Motion-JPEG is the
one mainstream video codec with no interframe state — every frame is
an independent JPEG — which is exactly why it is decodable here
without an external library. ISO-BMFF containers (MP4/MOV) parse for
real too (``operators/mp4.py`` — box walk, track metadata, and
in-container frame decode for JPEG-coded tracks); only interframe
entropy decode (H.264/VP9/AV1 sample payloads) remains the declared
boundary, since it genuinely needs external decoders.

The encoder exists for fixtures and round-trip tests: solid-color
frames encoded at quality=100 (all-ones quantization tables) survive
the DCT round trip bit-exactly (a solid block is DC-only; with q=1
the only error source is the <=0.5 DC rounding, which perturbs each
reconstructed channel by <0.2 — under the 0.5 round-to-int
threshold), so frame statistics are hand-derivable for oracles.

Scale notes: the codec is bytes-in/arrays-out and runs inside
``mapInPandas`` on executors (``multimodal.sample_video_frames``) —
one video's frames never leave the worker that holds its payload,
and sampling bounds the fan-out per row. Reference parity: the
reference pipeline has no media path at all; this is part of the §2.5
training-data surface (frame sampling for multimodal corpora).
"""

from __future__ import annotations

import struct

from .jpeg import decode_jpeg, encode_jpeg

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames_rgb: list[bytes],
    fps: int = 10,
    quality: int = 100,
    subsample: str = "444",
) -> bytes:
    """Encode raw RGB frames as an AVI/MJPG file (one JPEG per
    ``00dc`` chunk, word-aligned, with the standard header LIST and
    an ``idx1`` index)."""
    if not frames_rgb:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    jpegs = [
        encode_jpeg(width, height, f, quality=quality, subsample=subsample)
        for f in frames_rgb
    ]
    max_jpeg = max(len(j) for j in jpegs)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        us_per_frame,
        max_jpeg * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_jpeg,  # dwSuggestedBufferSize
        width,
        height,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            len(jpegs),  # dwLength (frames)
            max_jpeg,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (varying)
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0,
        0,
        0,
        0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b""
    index_entries = []
    for j in jpegs:
        # idx1 offsets are from the 'movi' fourcc (offset 4 = first
        # chunk id), the convention every mainstream muxer uses
        index_entries.append((4 + len(movi_body), len(j)))
        movi_body += chunk(b"00dc", j)
    movi = lst(b"movi", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in index_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(b: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_size) over a RIFF chunk run;
    chunks are word-aligned per the RIFF spec."""
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"RIFF chunk {cid!r} at {pos} overruns its parent"
            )
        yield cid, body, size
        pos = body + size + (size & 1)


def parse_avi(b: bytes) -> dict:
    """Parse an AVI container into its header fields and the list of
    per-frame JPEG payloads (zero-copy slices of ``b``).

    Returns ``{"width", "height", "n_frames", "us_per_frame",
    "fps", "duration_ms", "frames": [bytes, ...]}``. Non-MJPG video
    streams raise ``NotImplementedError`` (the declared interframe
    boundary); malformed containers raise ``ValueError``."""
    b = bytes(b)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') file")
    end = min(len(b), 8 + struct.unpack_from("<I", b, 4)[0])
    avih = None
    handler = None
    compression = None
    frames: list[bytes] = []
    for cid, body, size in _walk_chunks(b, 12, end):
        if cid != b"LIST":
            continue
        subtype = b[body : body + 4]
        if subtype == b"hdrl":
            for c2, b2, s2 in _walk_chunks(b, body + 4, body + size):
                if c2 == b"avih":
                    avih = struct.unpack_from("<14I", b, b2)
                elif c2 == b"LIST" and b[b2 : b2 + 4] == b"strl":
                    for c3, b3, s3 in _walk_chunks(b, b2 + 4, b2 + s2):
                        if c3 == b"strh" and b[b3 : b3 + 4] == b"vids":
                            handler = b[b3 + 4 : b3 + 8]
                        elif c3 == b"strf" and handler is not None and (
                            compression is None
                        ):
                            compression = b[b3 + 16 : b3 + 20]
        elif subtype == b"movi":
            for c2, b2, s2 in _walk_chunks(b, body + 4, body + size):
                # NNdc = compressed video, NNdb = uncompressed; both
                # carry the stream's frame payloads
                if c2[2:4] in (b"dc", b"db"):
                    frames.append(b[b2 : b2 + s2])
    if avih is None:
        raise ValueError("AVI missing avih header")
    codec = handler or compression or b"????"
    if codec not in (b"MJPG", b"mjpg") and (
        compression not in (b"MJPG", b"mjpg")
    ):
        raise NotImplementedError(
            f"AVI video codec {codec!r}: only MJPG (per-frame JPEG) "
            "decodes in-container; interframe codecs need an external "
            "decoder"
        )
    for i, f in enumerate(frames):
        if f[:3] != b"\xff\xd8\xff":
            raise ValueError(f"frame {i} is not a JPEG payload")
    us_per_frame = avih[0]
    return {
        "width": avih[8],
        "height": avih[9],
        "n_frames": len(frames),
        "us_per_frame": us_per_frame,
        "fps": (1_000_000 // us_per_frame) if us_per_frame else None,
        "duration_ms": len(frames) * us_per_frame // 1000,
        "frames": frames,
    }


def decode_avi_frame(parsed: dict, idx: int) -> tuple[int, int, bytes]:
    """Decode one frame of a ``parse_avi`` result to (w, h, rgb)."""
    return decode_jpeg(parsed["frames"][idx])


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """``k`` uniformly-spaced frame indices over ``n_frames`` —
    endpoints included, deterministic integer math (the standard
    training-data frame-sampling grid)."""
    if n_frames <= 0:
        return []
    if k <= 1 or n_frames == 1:
        return [0]
    if k >= n_frames:
        return list(range(n_frames))
    out: list[int] = []
    for i in range(k):
        j = i * (n_frames - 1) // (k - 1)
        if not out or j != out[-1]:
            out.append(j)
    return out
