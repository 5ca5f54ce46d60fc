"""YUV4MPEG2 reader tests (ops/videocodec.py) and the real (fake=False)
frame-sampling kernel built on it.

The writer/reader pair shares an author, so the tests pin the FORMAT
itself: hand-computed spec offsets (header line length, 4:2:0 frame
size w·h·3/2, FRAME\\n delimiters) and a byte-level check that frame 0
of the generated clip sits exactly where the spec says."""

import hashlib

import pytest

from filefilter_spark.ops import videocodec as vc


def test_y4m_header_and_frame_offsets_match_spec():
    data = vc.synth_y4m(16, 8, 3, fps=25)
    header = b"YUV4MPEG2 W16 H8 F25:1 Ip A1:1 C420\n"
    assert data[: len(header)] == header  # exact spec header line
    frame_size = 16 * 8 * 3 // 2  # 4:2:0 = w*h*3/2 per the spec
    # frame i starts at header + i*(6 + frame_size), prefixed "FRAME\n"
    for i in range(3):
        off = len(header) + i * (6 + frame_size)
        assert data[off : off + 6] == b"FRAME\n"
    assert len(data) == len(header) + 3 * (6 + frame_size)


def test_y4m_parse_and_info():
    data = vc.synth_y4m(16, 8, 5, fps=25)
    info = vc.y4m_info(data)
    assert info == {
        "width": 16, "height": 8, "fps_num": 25, "fps_den": 1,
        "n_frames": 5, "duration_ms": 200,
    }


def test_y4m_frames_differ_and_are_exact_bytes():
    data = vc.synth_y4m(8, 8, 2)
    frames = dict(vc.iter_frames(data))
    assert set(frames) == {0, 1}
    assert frames[0] != frames[1]  # per-frame luma shift
    # frame 0 luma: the documented gradient, chroma flat 128
    luma = bytes((x * 7 + y * 13) & 0xFF for y in range(8) for x in range(8))
    assert frames[0] == luma + bytes([128]) * (8 * 8 // 2)


def test_y4m_corrupt_rejected():
    data = vc.synth_y4m(8, 8, 2)
    with pytest.raises(vc.VideoFormatError):
        vc.y4m_info(data[:-10])  # truncated last frame
    with pytest.raises(vc.VideoFormatError):
        vc.parse_y4m(b"YUV4MPEG2 W0 H8 F30:1\n")
    with pytest.raises(vc.VideoFormatError):
        vc.parse_y4m(b"\x00\x00\x00\x18ftypmp42")  # MP4: needs a codec
    with pytest.raises(vc.VideoFormatError):
        vc.parse_y4m(vc.synth_y4m(8, 8, 1).replace(b"C420", b"C999"))


def test_y4m_through_real_frame_kernel(spark):
    """End-to-end through the mapInPandas fan-out with fake=False — the
    path OP-D6-frames-y4m registers. 7 frames, every 3rd sampled."""
    from filefilter_spark.ops.multimodal import frame_sample_stub, to_media_table

    data = vc.synth_y4m(16, 8, 7)
    df = spark.createDataFrame([(1, data)], "media_id long, payload binary")
    rows = frame_sample_stub(
        to_media_table(df, "media_id", "payload", media_type="video"),
        every_n=3, fake=False,
    ).collect()
    frames = dict(vc.iter_frames(data))
    want = {
        (1, i, hashlib.sha256(frames[i]).hexdigest()[:16]) for i in (0, 3, 6)
    }
    assert {(r.media_id, r.frame_idx, r.frame_hash) for r in rows} == want
