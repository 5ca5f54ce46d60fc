"""Cross-format corruption fuzz: every media codec must respond to
bit-flipped or truncated payloads with its typed format error (or a
successful decode of consistent geometry) — never an uncaught
IndexError/struct.error/numpy crash. This is the kernel contract that
keeps a dirty 100 TB scrape from killing executor tasks."""

import random

import pytest

from filefilter_spark.ops import audiocodec as ac
from filefilter_spark.ops import imagecodec as ic
from filefilter_spark.ops import videocodec as vc


def _mutations(data, n, seed):
    rng = random.Random(seed)
    yield from (data[:k] for k in (0, 1, 4, 11, len(data) // 2, len(data) - 1))
    for _ in range(n):
        b = bytearray(data)
        p = rng.randrange(len(b))
        b[p] ^= 1 << rng.randrange(8)
        yield bytes(b)


@pytest.mark.parametrize(
    "fixture",
    ["gif/grad_41x27.gif", "tiff/rgb_lzw.tif", "tiff/gray_packbits.tif"],
)
def test_image_codecs_survive_corruption(fixture):
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", fixture)
    with open(path, "rb") as f:
        data = f.read()
    for payload in _mutations(data, 200, seed=13):
        try:
            w, h, ch, px = ic.decode(payload)
            assert len(px) == w * h * ch
        except ic.ImageFormatError:
            pass


def test_wav_survives_corruption():
    data = ac.synth_wav(8000, 1, 2, 0.1, [440.0])
    for payload in _mutations(data, 200, seed=17):
        try:
            rate, nch, samples = ac.decode_wav(payload)
            assert rate > 0 and nch > 0
        except ac.AudioFormatError:
            pass


def test_y4m_survives_corruption():
    data = vc.synth_y4m(16, 8, 3)
    for payload in _mutations(data, 200, seed=19):
        try:
            for idx, frame in vc.iter_frames(payload):
                assert len(frame) > 0
        except vc.VideoFormatError:
            pass


def test_png_survives_corruption():
    data = ic.encode_png(16, 9, 3, bytes((7 * i) % 256 for i in range(16 * 9 * 3)))
    for payload in _mutations(data, 200, seed=23):
        try:
            w, h, ch, px = ic.decode(payload)
            assert len(px) == w * h * ch
        except ic.ImageFormatError:
            pass
