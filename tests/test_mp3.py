"""MPEG audio frame indexing (operators/multimodal.parse_mp3_frames):
header-table arithmetic, ID3v2 skip, byte-exact frame sampling, and
the probe/real_decode/sample_frames integration."""

from pyspark.sql import functions as F

from clickhub_spark.operators.multimodal import (
    parse_mp3_frames,
    probe_audio,
    real_decode,
    sample_frames,
    sample_mp3_frames,
)


def _mp3_header(ver_bits, layer_bits, br_idx, sr_idx, padding=0, channel_mode=0):
    h = (
        (0x7FF << 21)
        | (ver_bits << 19)
        | (layer_bits << 17)
        | (1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
        | (channel_mode << 6)
    )
    return h.to_bytes(4, "big")


def _mp3(n_frames, ver_bits=3, layer_bits=1, br_idx=9, sr_idx=0, channel_mode=0, id3=0):
    """Synthetic MPEG stream: valid headers + deterministic filler.
    Defaults: MPEG1 Layer III, 128 kbps, 44100 Hz, stereo."""
    out = bytearray()
    if id3:
        out += b"ID3" + bytes([4, 0, 0]) + bytes(
            [(id3 >> 21) & 0x7F, (id3 >> 14) & 0x7F, (id3 >> 7) & 0x7F, id3 & 0x7F]
        )
        out += bytes(id3)
    frames = []
    for i in range(n_frames):
        hdr = _mp3_header(ver_bits, layer_bits, br_idx, sr_idx, channel_mode=channel_mode)
        size = _expected_size(ver_bits, layer_bits, br_idx, sr_idx)
        body = bytes(((i * 7 + j) & 0xFF) for j in range(size - 4))
        frames.append(hdr + body)
        out += frames[-1]
    return bytes(out), frames


def _expected_size(ver_bits, layer_bits, br_idx, sr_idx):
    from clickhub_spark.operators.multimodal import _MP3_BITRATES, _MP3_RATES

    layer = 4 - layer_bits
    is1 = ver_bits == 3
    br = _MP3_BITRATES[(is1, layer)][br_idx] * 1000
    rate = _MP3_RATES[ver_bits][sr_idx]
    if layer == 1:
        return (12 * br // rate) * 4
    if layer == 3 and not is1:
        return 72 * br // rate
    return 144 * br // rate


def test_parse_mpeg1_layer3():
    payload, frames = _mp3(5)
    idx = parse_mp3_frames(payload)
    assert len(idx) == 5
    for i, (off, size, rate, ch, samples, kbps) in enumerate(idx):
        assert size == len(frames[i]) == 144 * 128000 // 44100
        assert (rate, ch, samples, kbps) == (44100, 2, 1152, 128)
    # offsets tile the stream exactly
    assert idx[0][0] == 0
    assert all(idx[i][0] + idx[i][1] == idx[i + 1][0] for i in range(4))


def test_parse_skips_id3v2_and_stops_at_garbage():
    payload, _ = _mp3(3, id3=500)
    assert len(parse_mp3_frames(payload)) == 3
    assert len(parse_mp3_frames(payload + b"TAGgarbage" * 3)) == 3
    assert parse_mp3_frames(b"not audio at all" * 10) == []
    assert parse_mp3_frames(None) == []


def test_parse_mpeg25_layer3_mono():
    # MPEG2.5 (ver_bits 0), 8 kbps (br_idx 1), 8000 Hz (sr_idx 2), mono
    payload, frames = _mp3(4, ver_bits=0, br_idx=1, sr_idx=2, channel_mode=3)
    idx = parse_mp3_frames(payload)
    assert len(idx) == 4
    off, size, rate, ch, samples, kbps = idx[0]
    assert size == 72 * 8000 // 8000 == len(frames[0])
    assert (rate, ch, samples, kbps) == (8000, 1, 576, 8)


def test_probe_audio_reports_mp3():
    payload, _ = _mp3(6)
    assert probe_audio(payload) == ("mp3", 44100, 2, 6 * 1152)
    # single frame is not enough evidence — random bytes can contain
    # one sync-looking word
    one, _ = _mp3(1)
    assert probe_audio(one)[0] is None


def test_sample_mp3_frames_byte_exact():
    payload, frames = _mp3(10)
    sampled = sample_mp3_frames(payload, every_nth=3, max_frames=3)
    assert [i for i, _ in sampled] == [0, 3, 6]
    for i, frame in sampled:
        assert frame == frames[i]


def test_real_decode_mp3_features():
    payload, _ = _mp3(8)
    feats = real_decode(payload)
    assert feats[:4] == [44100.0, 2.0, 8 * 1152.0, 8.0]
    assert feats[4] == 128.0  # mean kbps
    assert abs(feats[5] - (8 * 1152) / 44100) < 1e-6  # duration


def test_sample_frames_dataframe_mp3_path(spark):
    payload, frames = _mp3(9)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id LONG, payload BINARY")
    rows = sample_frames(df, every_nth=4, max_frames=2).orderBy("frame_idx").collect()
    assert [(r.doc_id, r.frame_idx) for r in rows] == [(1, 0), (1, 4)]
    assert bytes(rows[0].frame) == frames[0]
    assert bytes(rows[1].frame) == frames[4]


def test_parse_skips_id3v24_footer():
    # ADVICE r5: the ID3v2.4 footer flag (byte 5 bit 4) adds 10 bytes
    # after the tag body; without the adjustment the first sync probe
    # landed inside the footer and the index came back empty.
    payload, _ = _mp3(3, id3=500)
    # rewrite the header: set footer flag and append the 10-byte footer
    # between tag body and first frame
    flags = payload[5] | 0x10
    with_footer = (
        payload[:5]
        + bytes([flags])
        + payload[6:10]
        + payload[10 : 10 + 500]
        + b"3DI" + bytes([4, 0, flags]) + payload[6:10]
        + payload[10 + 500 :]
    )
    assert len(parse_mp3_frames(with_footer)) == 3
