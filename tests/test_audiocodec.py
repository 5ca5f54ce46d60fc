"""WAV decoder + MFCC fingerprint tests (ops/audiocodec.py) and the
real (fake=False) audio kernel built on it.

Fixtures are generated with the stdlib ``wave`` writer — an
independent implementation of the RIFF container, so the parser can't
self-verify — and signal-level assertions (tone frequency recovered,
distinct tones fingerprint apart) check the MFCC math, not just
plumbing."""

import struct

import numpy as np
import pytest

from filefilter_spark.ops import audiocodec as ac


def test_wav_geometry_and_amplitude_16bit_mono():
    data = ac.synth_wav(8000, 1, 2, 0.25, [440.0])
    rate, nch, samples = ac.decode_wav(data)
    assert (rate, nch, samples.shape) == (8000, 1, (2000, 1))
    assert abs(float(np.abs(samples).max()) - 0.5) < 0.01  # amplitude 0.5


def test_wav_stereo_and_8bit():
    st = ac.synth_wav(44100, 2, 2, 0.1, [440.0, 880.0])
    rate, nch, samples = ac.decode_wav(st)
    assert (rate, nch, samples.shape) == (44100, 2, (4410, 2))
    e = ac.synth_wav(8000, 1, 1, 0.25, [440.0])
    rate, nch, samples = ac.decode_wav(e)
    assert (rate, nch, samples.shape) == (8000, 1, (2000, 1))
    assert abs(float(np.abs(samples).max()) - 0.5) < 0.02  # 8-bit quantization


def test_wav_tone_frequency_recovered():
    """The decoded 440 Hz tone's dominant FFT bin must sit at 440 Hz —
    sample decode order/scaling verified at the signal level."""
    data = ac.synth_wav(8000, 1, 2, 0.5, [440.0])
    rate, _nch, samples = ac.decode_wav(data)
    spec = np.abs(np.fft.rfft(samples[:, 0]))
    peak_hz = float(np.argmax(spec)) * rate / len(samples)
    assert abs(peak_hz - 440.0) < 5.0


def test_mfcc_distinguishes_tones():
    lo = ac.wav_features(ac.synth_wav(8000, 1, 2, 0.25, [440.0]))
    hi = ac.wav_features(ac.synth_wav(8000, 1, 2, 0.25, [3000.0]))
    assert lo["mfcc_hash"] != hi["mfcc_hash"]
    # the raw coefficient vectors differ substantially, not just in hash
    assert float(np.abs(lo["_mfcc"] - hi["_mfcc"]).max()) > 1.0
    # and identical inputs fingerprint identically (determinism)
    again = ac.wav_features(ac.synth_wav(8000, 1, 2, 0.25, [440.0]))
    assert again["mfcc_hash"] == lo["mfcc_hash"]


def test_wav_features_geometry():
    f = ac.wav_features(ac.synth_wav(8000, 1, 2, 0.25, [440.0]))
    assert (f["duration_ms"], f["sample_rate"], f["n_samples"]) == (250, 8000, 2000)


def test_compressed_and_corrupt_wav_rejected():
    data = bytearray(ac.synth_wav(8000, 1, 2, 0.05, [440.0]))
    # format tag 85 = MPEG Layer III inside RIFF: needs a codec library
    fmt_at = bytes(data).find(b"fmt ") + 8
    data[fmt_at : fmt_at + 2] = struct.pack("<H", 85)
    with pytest.raises(ac.AudioFormatError, match="codec library"):
        ac.decode_wav(bytes(data))
    with pytest.raises(ac.AudioFormatError):
        ac.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks
    with pytest.raises(ac.AudioFormatError):
        ac.decode_wav(b"ID3\x03\x00 not a riff at all")


def test_wav_through_real_audio_kernel(spark):
    """End-to-end through the mapInPandas kernel with fake=False — the
    path OP-D6-audio-wav registers."""
    from filefilter_spark.ops.multimodal import (
        extract_audio_features_stub,
        to_media_table,
    )

    data = ac.synth_wav(8000, 1, 2, 0.25, [440.0])
    df = spark.createDataFrame([(1, data)], "media_id long, payload binary")
    rows = extract_audio_features_stub(
        to_media_table(df, "media_id", "payload", media_type="audio"), fake=False
    ).collect()
    assert [(r.media_id, r.duration_ms, r.sample_rate, r.n_samples) for r in rows] == [
        (1, 250, 8000, 2000)
    ]


def test_mfcc_full_frame_at_44khz():
    """At 44.1 kHz the 25 ms frame (1102 samples) exceeds a fixed
    512-point FFT; the transform must grow instead of silently cropping
    each frame to its first 11.6 ms."""
    import numpy as np

    from filefilter_spark.ops.audiocodec import mfcc_mean

    rng = np.random.default_rng(7)
    sig = rng.standard_normal(44100)  # 1 s of noise
    full = mfcc_mean(sig, 44100)
    assert np.all(np.isfinite(full)) and len(full) == 13
    # energy placed ONLY in the tail of each frame (beyond sample 512)
    # must still influence the output
    tone = np.zeros(44100)
    t = np.arange(44100)
    frame, hop = 1102, 441
    for start in range(0, 44100 - frame, hop):
        tone[start + 600 : start + frame] = np.sin(t[: frame - 600] * 0.6)
    assert not np.allclose(mfcc_mean(tone, 44100), mfcc_mean(np.zeros(44100), 44100))
    # 16 kHz fixtures must be bit-identical to the pre-fix pipeline
    sig16 = rng.standard_normal(16000)
    assert np.array_equal(mfcc_mean(sig16, 16000), mfcc_mean(sig16, 16000, n_fft=512))
