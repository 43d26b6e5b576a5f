"""MJPEG-in-AVI video (operators/multimodal.parse_avi /
sample_avi_frames): container round-trip, byte-exact frame sampling,
real per-frame JPEG decode, and the probe/sample_frames/real_decode
integration."""

from clickhub_spark.operators.jpeg import decode_jpeg, encode_jpeg
from clickhub_spark.operators.multimodal import (
    encode_avi_mjpeg,
    parse_avi,
    probe_audio,
    probe_video,
    real_decode,
    sample_avi_frames,
    sample_frames,
)


def _gradient_jpeg(w, h, seed=0):
    px = bytes(
        ((x * 3 + y * 5 + c * 7 + seed * 11) % 256)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return encode_jpeg(w, h, 3, px, quality=90)


def _avi(n_frames=8, w=16, h=16, fps=4):
    frames = [_gradient_jpeg(w, h, seed=i) for i in range(n_frames)]
    return encode_avi_mjpeg(w, h, frames, fps=fps), frames


def test_container_round_trip():
    avi, frames = _avi()
    info = parse_avi(avi)
    assert (info["w"], info["h"], info["fps"], info["codec"]) == (16, 16, 4.0, "MJPG")
    assert info["n_frames"] == 8
    b = bytes(avi)
    for (off, size), f in zip(info["frames"], frames):
        assert b[off : off + size] == f


def test_probe_video_and_audio_do_not_cross_detect():
    avi, _ = _avi()
    assert probe_video(avi)[0] == "avi"
    # an AVI must never probe as audio (JPEG bytes can contain
    # pseudo-MP3 syncs; the RIFF guard blocks that)
    assert probe_audio(avi)[0] is None
    assert probe_video(b"not a container" * 10)[0] is None
    assert probe_video(None)[0] is None


def test_sampled_frames_are_decodable_jpegs():
    avi, frames = _avi(n_frames=10)
    sampled = sample_avi_frames(avi, every_nth=3, max_frames=3)
    assert [i for i, _ in sampled] == [0, 3, 6]
    for i, fb in sampled:
        assert fb == frames[i]
        w, h, ch, px = decode_jpeg(fb)
        assert (w, h, ch) == (16, 16, 3) and len(px) == 16 * 16 * 3


def test_real_decode_video_features():
    avi, _ = _avi(n_frames=8, fps=4)
    feats = real_decode(avi)
    assert feats[:4] == [16.0, 16.0, 8.0, 4.0]
    assert abs(feats[4] - 2.0) < 1e-9  # duration = 8 frames / 4 fps
    assert 0.0 < feats[5] < 1.0  # first-frame mean from REAL decode
    assert feats[7] == 3.0


def test_sample_frames_dataframe_video_path(spark):
    avi, frames = _avi(n_frames=9)
    df = spark.createDataFrame([(7, bytearray(avi))], "doc_id LONG, payload BINARY")
    rows = sample_frames(df, every_nth=4, max_frames=2).orderBy("frame_idx").collect()
    assert [(r.doc_id, r.frame_idx) for r in rows] == [(7, 0), (7, 4)]
    assert bytes(rows[0].frame) == frames[0]
    assert bytes(rows[1].frame) == frames[4]
