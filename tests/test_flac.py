"""FLAC frame codec (r10, operators/flac.py): round trips against the
fixture encoder, a byte-level pin of the frame header, and HAND-BUILT
frames exercising the decoder paths the fixture encoder never writes —
VERBATIM + wasted bits, LPC, mid/side + rice2 + multi-partition +
escape partitions — so the decoder is checked against the spec's bit
layout, not just its own encoder."""

from __future__ import annotations

import math
import random

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.audio_meta import (
    encode_flac_headers,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number_write,
    decode_flac,
    encode_flac,
)


def test_encode_decode_round_trips():
    rnd = random.Random(9)
    mono = (
        [100] * 256
        + [i - 300 for i in range(256)]
        + [int(8000 * math.sin(i / 10)) for i in range(256)]
        + [rnd.randrange(-32768, 32768) for _ in range(232)]
    )
    rate, ch, bps, chans = decode_flac(encode_flac([mono], 8000))
    assert (rate, ch, bps) == (8000, 1, 16)
    assert chans[0] == mono
    left = [int(1000 * math.sin(i / 7)) for i in range(700)]
    right = [int(900 * math.cos(i / 11)) for i in range(700)]
    for stereo in ("independent", "left_side"):
        _, _, _, chans = decode_flac(
            encode_flac([left, right], 44100, stereo=stereo)
        )
        assert chans == [left, right], stereo
    # tail block != 256 exercises the end-of-header 16-bit size form
    short = list(range(-150, 150))  # 300 samples -> blocks 256 + 44
    _, _, _, chans = decode_flac(encode_flac([short], 22050))
    assert chans[0] == short


def test_frame_header_bytes_pinned():
    """Independent pin of the header layout: sync/codes/number/CRC-8
    computed here by hand, not by the codec."""
    b = encode_flac([[7] * 256], 8000)
    # metadata: fLaC + one STREAMINFO block (4-byte header + 34 body)
    frame = b.index(b"\xff\xf8")
    hdr = b[frame : frame + 4]
    # FF F8 = sync 11111111111110 + reserved 0 + fixed blocking 0
    # byte 2 = block size code 8 (256) << 4 | rate code 0 (STREAMINFO)
    # byte 3 = channel code 0 (mono) << 4 | size code 4 (16b) << 1 | 0
    assert hdr == bytes([0xFF, 0xF8, 0x80, 0x08])
    assert b[frame + 4] == 0x00  # UTF-8 frame number 0
    assert b[frame + 5] == _crc8(b[frame : frame + 5])


def _hand_frame(si_rate, nch_code, bps_code, block_size, body_bits):
    """Build one frame: header (block-size via 16-bit end-of-header
    form so any size works) + caller-provided subframe bits."""
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)  # reserved + fixed blocking
    w.write(7, 4)  # block size: 16-bit value-1 at end
    w.write(0, 4)  # rate from STREAMINFO
    w.write(nch_code, 4)
    w.write(bps_code, 3)
    w.write(0, 1)
    _utf8_number_write(w, 0)
    w.write(block_size - 1, 16)
    w.align()
    hdr = w.bytes()
    w2 = _BitWriter()
    for byte in hdr:
        w2.write(byte, 8)
    w2.write(_crc8(hdr), 8)
    body_bits(w2)
    w2.align()
    frame = w2.bytes()
    return frame + _crc16(frame).to_bytes(2, "big")


def test_hand_built_verbatim_with_wasted_bits():
    """VERBATIM subframe with 2 wasted bits: stored samples are the
    true samples >> 2, decoder shifts them back."""
    samples = [v << 2 for v in (-5, 3, 0, 7, -8, 1, 2, -1)]

    def body(w):
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(1, 1)  # wasted-bits flag
        w.write(1, 2)  # unary 1 -> wasted = 2 (one 0 then stop 1)
        for v in samples:
            w.write(v >> 2, 14)  # bps 16 - 2 wasted

    head = encode_flac_headers(
        sample_rate=8000, channels=1, bits=16, total_samples=8
    )
    b = head + _hand_frame(8000, 0, 4, 8, body)
    rate, ch, bps, chans = decode_flac(b)
    assert chans[0] == samples


def test_hand_built_lpc_mid_side_rice2_partitions_escape():
    """One stereo frame, mid/side: the MID channel is an LPC order-1
    subframe (coef [2], shift 1 -> x[i] = x[i-1] + r) with a RICE2
    residual in 2 partitions; the SIDE channel (+1 bit) is a FIXED
    order-0 subframe whose single partition uses the ESCAPE raw
    form. Expected output computed right here with plain integer
    arithmetic from the written parameters."""
    block = 8
    mid = [10]
    resid_mid = [3, -2, 0, 5, -1, 2, 4]
    for r in resid_mid:
        mid.append(((2 * mid[-1]) >> 1) + r)
    side = [1, -3, 2, 0, -1, 4, -2, 3]

    def body(w):
        # MID subframe: LPC order 1
        w.write(0, 1)
        w.write(32 | (1 - 1), 6)  # LPC, order 1
        w.write(0, 1)  # no wasted bits
        w.write(mid[0], 16)  # warmup
        w.write(3, 4)  # precision-1 = 3 -> 4-bit coefs
        w.write(1, 5)  # shift 1
        w.write(2, 4)  # coef [2]
        # residual: rice2 (method 1), partition order 1 -> 2 parts
        w.write(1, 2)
        w.write(1, 4)
        # part 1: block/2 - order = 3 samples, param 2
        w.write(2, 5)
        for v in resid_mid[:3]:
            folded = (v << 1) if v >= 0 else (((-v) << 1) - 1)
            q, rem = folded >> 2, folded & 3
            w.write(1, q + 1)  # q zeros then a one
            w.write(rem, 2)
        # part 2: 4 samples, param 0 (pure unary)
        w.write(0, 5)
        for v in resid_mid[3:]:
            folded = (v << 1) if v >= 0 else (((-v) << 1) - 1)
            w.write(1, folded + 1)
        # SIDE subframe (bps 17): FIXED order 0, escape partition
        w.write(0, 1)
        w.write(8 | 0, 6)  # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)  # rice (4-bit params)
        w.write(0, 4)  # partition order 0
        w.write(0xF, 4)  # ESCAPE
        w.write(6, 5)  # raw 6-bit two's complement
        for v in side:
            w.write(v & 0x3F, 6)

    head = encode_flac_headers(
        sample_rate=8000, channels=2, bits=16, total_samples=block
    )
    b = head + _hand_frame(8000, 10, 4, block, body)  # 10 = mid/side
    rate, ch, bps, chans = decode_flac(b)
    left, right = [], []
    for m, s in zip(mid, side):
        mm = (m << 1) | (s & 1)
        left.append((mm + s) >> 1)
        right.append((mm - s) >> 1)
    assert chans == [left, right]
    assert [x - y for x, y in zip(left, right)] == side


def test_crc_corruption_detected():
    b = bytearray(encode_flac([[i % 100 for i in range(300)]], 8000))
    b[-3] ^= 0x10  # inside the last frame's body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(b))


def test_decode_media_flac_features_match_wav(spark):
    """decode_media now runs the FULL FLAC decode (r10): a FLAC and a
    WAV of IDENTICAL PCM emit bit-identical 8-dim audio features
    (same normalization), real duration/rate from the frames; a
    frameless FLAC (metadata blocks only) falls back to the
    metadata-only row with a null feature."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
        multimodal as MM,
    )

    samples = [
        int(20000 * math.sin(2 * math.pi * 440 * i / 8000))
        for i in range(2048)
    ]
    flac_p = encode_flac([samples], 8000)
    wav_p = MM.encode_wav(8000, 1, samples)
    rows = [
        (1, "audio", bytearray(flac_p),
         {"mime": "audio/flac", "n_bytes": len(flac_p),
          "width": None, "height": None, "duration_ms": None}),
        (2, "audio", bytearray(wav_p),
         {"mime": "audio/wav", "n_bytes": len(wav_p),
          "width": None, "height": None, "duration_ms": None}),
        (3, "audio",
         bytearray(encode_flac_headers(48000, 1, 16, 480000)),
         {"mime": "audio/flac", "n_bytes": 10,
          "width": None, "height": None, "duration_ms": None}),
    ]
    out = {
        r.media_id: r
        for r in MM.decode_media(
            spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        ).collect()
    }
    assert out[1].feature == out[2].feature
    assert out[1].duration_ms == 256 and out[1].sample_rate == 8000
    assert out[3].feature is None and out[3].duration_ms == 10000


def test_flac_pcm_stats_operator(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
        multimodal as MM,
    )

    p = encode_flac([[5] * 300, [-5] * 300], 8000)
    rows = [
        (1, "audio", bytearray(p),
         {"mime": "audio/flac", "n_bytes": len(p),
          "width": None, "height": None, "duration_ms": None}),
        (2, "audio", bytearray(b"not flac"),
         {"mime": "application/octet-stream", "n_bytes": 8,
          "width": None, "height": None, "duration_ms": None}),
    ]
    got = sorted(
        map(
            tuple,
            MM.flac_pcm_stats(
                spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
            ).collect(),
        )
    )
    assert got == [
        (1, 0, 8000, 16, 300, 5, 5, 1500),
        (1, 1, 8000, 16, 300, -5, -5, -1500),
    ]
