"""Pure-stdlib YUV4MPEG2 (.y4m) reader backing the video frame kernel.

y4m is the standard UNCOMPRESSED video interchange format (the one
ffmpeg pipes produce): a single ASCII parameter line, then frames as
``FRAME\\n`` + raw planar YUV bytes. Parsing it needs no codec
library, so the frame-sampling kernel can be REAL for .y4m payloads
the same way the image kernel is real for PNG/BMP/baseline-JPEG and
the audio kernel for WAV. Compressed video (H.264/VP9/AV1 in
MP4/WebM/MKV) genuinely needs a decoder and still refuses loudly.

Format per the mjpegtools specification: header ``YUV4MPEG2`` then
space-separated tagged params — ``W<int> H<int> F<num>:<den>``
required here, ``I`` (interlace), ``A`` (aspect), ``C`` (colorspace,
default 420) honored for frame sizing. Each frame is ``FRAME`` +
optional params + ``\\n`` + exactly plane-size bytes (420: w·h·3/2,
422: w·h·2, 444: w·h·3, mono: w·h).
"""

from __future__ import annotations


class VideoFormatError(ValueError):
    """Payload is not a video format this reader can parse."""


_MAGIC = b"YUV4MPEG2"

# colorspace tag prefix -> bytes per pixel numerator/denominator
_PLANE_SIZE = {
    "420": (3, 2),   # 4:2:0 — includes 420jpeg/420mpeg2/420paldv
    "422": (2, 1),
    "444": (3, 1),
    "mono": (1, 1),
}


def sniff_y4m(data: bytes) -> bool:
    return data[: len(_MAGIC)] == _MAGIC


def parse_y4m(data: bytes):
    """Parse a y4m payload → (width, height, fps_num, fps_den,
    frame_size, frames_offset). Raises VideoFormatError otherwise."""
    if not sniff_y4m(data):
        raise VideoFormatError("not a YUV4MPEG2 payload")
    nl = data.find(b"\n")
    if nl < 0:
        raise VideoFormatError("truncated y4m header")
    try:
        params = data[len(_MAGIC) : nl].decode("ascii").split()
    except UnicodeDecodeError as e:
        raise VideoFormatError(f"bad y4m header: {e}") from e
    w = h = None
    fps_num, fps_den = 30, 1
    cs = "420"
    try:
        for p in params:
            if p.startswith("W"):
                w = int(p[1:])
            elif p.startswith("H"):
                h = int(p[1:])
            elif p.startswith("F"):
                num, den = p[1:].split(":")
                fps_num, fps_den = int(num), int(den)
            elif p.startswith("C"):
                cs = p[1:]
    except ValueError as e:
        raise VideoFormatError(f"bad y4m parameter: {e}") from e
    if not w or not h or w <= 0 or h <= 0 or fps_den == 0:
        raise VideoFormatError("y4m missing/invalid W/H/F parameters")
    size = None
    for prefix, (num, den) in _PLANE_SIZE.items():
        if cs.startswith(prefix):
            size = w * h * num // den
    if size is None:
        raise VideoFormatError(f"unsupported y4m colorspace {cs!r}")
    return w, h, fps_num, fps_den, size, nl + 1


def iter_frames(data: bytes):
    """Yield (frame_idx, frame_bytes) for every frame in the payload."""
    _w, _h, _fn, _fd, size, pos = parse_y4m(data)
    idx = 0
    while pos < len(data):
        nl = data.find(b"\n", pos)
        if nl < 0 or data[pos : pos + 5] != b"FRAME":
            raise VideoFormatError(f"bad frame header at byte {pos}")
        start = nl + 1
        frame = data[start : start + size]
        if len(frame) < size:
            raise VideoFormatError(f"truncated frame {idx}")
        yield idx, frame
        idx += 1
        pos = start + size


def y4m_info(data: bytes) -> dict:
    w, h, fn, fd, size, pos = parse_y4m(data)
    n = sum(1 for _ in iter_frames(data))
    return {
        "width": w,
        "height": h,
        "fps_num": fn,
        "fps_den": fd,
        "n_frames": n,
        "duration_ms": n * 1000 * fd // fn if fn else 0,
    }


def synth_y4m(
    w: int, h: int, n_frames: int, fps: int = 30, colorspace: str = "420"
) -> bytes:
    """Deterministic test-clip generator: per-frame gradient luma
    (shifted by frame index so every frame hashes differently), flat
    mid chroma. Writing the format is one header line + raw planes —
    offsets are asserted against hand-computed spec values in tests so
    writer and reader can't co-drift."""
    num, den = _PLANE_SIZE[colorspace]
    luma = bytearray(w * h)
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C{colorspace}\n".encode())
    for f in range(n_frames):
        for y in range(h):
            row = y * w
            for x in range(w):
                luma[row + x] = (x * 7 + y * 13 + f * 31) & 0xFF
        chroma = bytes([128]) * (w * h * num // den - w * h)
        out += b"FRAME\n" + bytes(luma) + chroma
    return bytes(out)
