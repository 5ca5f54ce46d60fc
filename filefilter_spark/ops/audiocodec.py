"""Pure-stdlib WAV (RIFF PCM) decoder + numpy MFCC fingerprint.

The container ships no soundfile/librosa/ffmpeg, but the dominant raw
audio interchange format — RIFF WAVE with integer PCM or IEEE-float
samples — needs nothing beyond ``struct`` to parse, and an MFCC
fingerprint needs nothing beyond numpy (frame → Hamming window → rFFT
→ mel filterbank → log → DCT-II), so the audio feature kernel can be
REAL for .wav payloads the same way the image kernel is real for
PNG/BMP/baseline-JPEG. Compressed codecs (MP3/AAC/Opus/…) genuinely
need a codec library and still refuse loudly.

MFCC recipe (the standard HTK-style pipeline, fixed here so the
fingerprint is deterministic and documentable): 25 ms frames / 10 ms
hop, 512-point rFFT, 26 triangular mel filters from 0 to Nyquist
(HTK mel = 2595·log10(1+f/700)), log energies floored at 1e-10, 13
DCT-II coefficients per frame, averaged over frames, rounded to 3
decimals before hashing. Rounding makes the hash robust to
last-ulp FFT differences across numpy builds; the averaged
coefficients are also returned raw for tests to assert real signal
properties (e.g. a 440 Hz tone and white noise fingerprint apart).
"""

from __future__ import annotations

import struct


class AudioFormatError(ValueError):
    """Payload is not an audio format this codec can decode."""


def sniff_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes):
    """Parse a RIFF WAVE payload → (sample_rate, n_channels, samples)
    with ``samples`` a float64 numpy array of shape (n, channels) in
    [-1, 1]. Supports PCM 8/16/24/32-bit and IEEE float32/64."""
    import numpy as np

    if not sniff_wav(data):
        raise AudioFormatError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    try:
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                audio_fmt, nch, rate, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if audio_fmt == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                    audio_fmt = struct.unpack("<H", body[24:26])[0]
                fmt = (audio_fmt, nch, rate, bits)
            elif cid == b"data":
                pcm = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
    except struct.error as e:
        raise AudioFormatError(f"truncated WAV chunk structure: {e}") from e
    if fmt is None or pcm is None:
        raise AudioFormatError("WAV missing fmt/data chunk")
    audio_fmt, nch, rate, bits = fmt
    if nch == 0 or rate == 0:
        raise AudioFormatError("WAV with zero channels or sample rate")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # unsigned
            x = np.frombuffer(pcm, np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(pcm[: len(pcm) // 2 * 2], "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(pcm[: len(pcm) // 3 * 3], np.uint8).reshape(-1, 3)
            x = (
                (b[:, 0].astype(np.int32))
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(pcm[: len(pcm) // 4 * 4], "<i4").astype(np.float64) / float(1 << 31)
        else:
            raise AudioFormatError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(pcm[: len(pcm) // 4 * 4], "<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(pcm[: len(pcm) // 8 * 8], "<f8").astype(np.float64)
        else:
            raise AudioFormatError(f"unsupported float bit depth {bits}")
    else:
        raise AudioFormatError(
            f"compressed WAV (format tag {audio_fmt}) needs a codec library"
        )
    n = len(x) // nch
    return rate, nch, x[: n * nch].reshape(n, nch)


def _mel(f):
    import numpy as np

    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_inv(m):
    import numpy as np

    return 700.0 * (np.power(10.0, m / 2595.0) - 1.0)


def mfcc_mean(
    samples,
    rate: int,
    n_mels: int = 26,
    n_coef: int = 13,
    n_fft: int = 512,
):
    """Frame-averaged MFCC vector (length ``n_coef``) of a mono-mixed
    signal — the standard 25 ms / 10 ms pipeline, pure numpy."""
    import numpy as np

    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    frame = max(1, int(rate * 0.025))
    hop = max(1, int(rate * 0.010))
    # rfft(frames, n) CROPS frames longer than n: at 44.1 kHz the 25 ms
    # frame is 1102 samples and a fixed 512-point FFT would silently
    # discard the last 590 windowed samples. Grow n_fft to the next
    # power of two >= the frame (>=512 keeps 8/16 kHz outputs, and
    # their committed fixtures, bit-identical).
    while n_fft < frame:
        n_fft *= 2
    if len(mono) < frame:  # pad one short frame rather than refuse
        mono = np.pad(mono, (0, frame - len(mono)))
    n_frames = 1 + (len(mono) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = mono[idx] * np.hamming(frame)
    spec = np.abs(np.fft.rfft(frames, n_fft)) ** 2  # power spectrum

    # triangular mel filterbank, 0..Nyquist
    mel_pts = _mel_inv(np.linspace(_mel(0.0), _mel(rate / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * mel_pts / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[m - 1, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[m - 1, k] = (hi - k) / (hi - ctr)
    logmel = np.log(np.maximum(spec @ fb.T, 1e-10))

    # DCT-II (orthonormal) via explicit basis — no scipy in container
    k = np.arange(n_mels)
    basis = np.cos(np.pi * np.arange(n_coef)[:, None] * (2 * k + 1) / (2 * n_mels))
    basis *= np.sqrt(2.0 / n_mels)
    basis[0] /= np.sqrt(2.0)
    return (logmel @ basis.T).mean(axis=0)


def wav_features(data: bytes) -> dict:
    """The real audio kernel: geometry from the fmt/data chunks, MFCC
    fingerprint over the decoded samples (rounded to 3dp pre-hash for
    cross-build stability)."""
    import hashlib

    rate, nch, samples = decode_wav(data)
    n = samples.shape[0]
    coef = mfcc_mean(samples, rate)
    h = hashlib.sha256(
        ",".join(f"{c:.3f}" for c in coef).encode("ascii")
    ).hexdigest()[:16]
    return {
        "duration_ms": n * 1000 // rate,
        "sample_rate": int(rate),
        "n_samples": int(n),
        "mfcc_hash": h,
        "_mfcc": coef,  # raw vector for tests; dropped by the kernel
    }

def synth_wav(
    rate: int,
    n_channels: int,
    sampwidth: int,
    seconds: float,
    freqs: list[float],
    amplitude: float = 0.5,
) -> bytes:
    """Deterministic test-tone WAV generator (stdlib ``wave`` writer —
    an independent implementation of the container format, so decoder
    tests aren't self-verifying). Sine per channel at ``freqs[c]``."""
    import io
    import math
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_channels)
    w.setsampwidth(sampwidth)
    w.setframerate(rate)
    n = int(rate * seconds)
    frames = bytearray()
    for i in range(n):
        for c in range(n_channels):
            v = amplitude * math.sin(2 * math.pi * freqs[c % len(freqs)] * i / rate)
            if sampwidth == 1:
                frames.append(int(v * 127) + 128)
            elif sampwidth == 2:
                frames += struct.pack("<h", int(v * 32767))
            else:
                raise ValueError("synth_wav supports 8/16-bit only")
    w.writeframes(bytes(frames))
    w.close()
    return buf.getvalue()
