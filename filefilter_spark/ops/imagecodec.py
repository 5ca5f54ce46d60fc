"""Pure-stdlib image codec (PNG + BMP) backing the multimodal kernels.

This container ships no Pillow/libvips/ffmpeg, so the real (non-fake)
decode path is implemented directly on ``zlib`` + ``struct``: PNG
(8-bit gray / gray+alpha / RGB / RGBA / palette, non-interlaced — the
formats a training-data scrape overwhelmingly contains) and BMP
(24/32-bit uncompressed). That keeps the kernels honest — real pixels
in, real pixels out — while staying inside the no-new-dependency rule.
JPEG/WebP/video remain NotImplementedError: entropy-coded formats
genuinely need a codec library, and faking them would be worse than
refusing.

Scope note: these kernels run inside Arrow-batched ``mapInPandas``
(see ``ops/multimodal.py``), so per-image Python cost is the budget.
The unfilter loop is per-scanline numpy where the filter allows
(None/Sub/Up) and per-byte only for Average/Paeth; fine for the
thumbnail/metadata sizes this tier targets. A production swap-in of a
C codec changes only these functions, never the Spark plan.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class ImageFormatError(ValueError):
    """Payload is not a format this codec can decode."""


def sniff(data: bytes) -> str | None:
    if data.startswith(_PNG_SIG):
        return "png"
    if data[:2] == b"BM" and len(data) >= 26:
        return "bmp"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a non-interlaced 8-bit PNG → (width, height, channels,
    raw interleaved pixel bytes). Palette images are expanded to RGB."""
    if not data.startswith(_PNG_SIG):
        raise ImageFormatError("not a PNG")
    pos, ihdr, idat, plte = len(_PNG_SIG), None, [], None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ImageFormatError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ImageFormatError(
            f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ImageFormatError("PNG pixel data shorter than geometry")

    try:
        import numpy as np
    except ImportError:  # pragma: no cover - numpy is baked in
        np = None

    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        filt = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if filt == 0:
            pass
        elif filt == 2:  # Up — vectorizable
            if np is not None:
                line = bytearray(
                    (
                        (np.frombuffer(bytes(line), np.uint8).astype(np.uint16)
                         + np.frombuffer(bytes(prev), np.uint8)) & 0xFF
                    ).astype(np.uint8).tobytes()
                )
            else:
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ImageFormatError(f"bad PNG filter {filt}")
        out[y * stride : (y + 1) * stride] = line
        prev = line

    if color == 3:  # palette → RGB
        if plte is None:
            raise ImageFormatError("palette PNG without PLTE")
        rgb = bytearray(w * h * 3)
        for i, idx in enumerate(out):
            rgb[i * 3 : i * 3 + 3] = plte[idx * 3 : idx * 3 + 3]
        return w, h, 3, bytes(rgb)
    return w, h, ch, bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed 24/32-bit BMP → (w, h, channels, RGB(A)
    bytes, top-down)."""
    if data[:2] != b"BM":
        raise ImageFormatError("not a BMP")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ImageFormatError("BITMAPCOREHEADER unsupported")
    w, h_signed = struct.unpack("<ii", data[18:26])
    bpp, comp = struct.unpack("<HI", data[28:34])
    if comp != 0 or bpp not in (24, 32):
        raise ImageFormatError(f"unsupported BMP (bpp={bpp} compression={comp})")
    h, bottom_up = abs(h_signed), h_signed > 0
    ch = bpp // 8
    row_bytes = (w * ch + 3) & ~3
    out = bytearray(w * h * ch)
    for y in range(h):
        src_y = (h - 1 - y) if bottom_up else y
        row = data[pixel_off + src_y * row_bytes :][: w * ch]
        # BGR(A) → RGB(A)
        for x in range(w):
            px = row[x * ch : (x + 1) * ch]
            dst = (y * w + x) * ch
            out[dst], out[dst + 1], out[dst + 2] = px[2], px[1], px[0]
            if ch == 4:
                out[dst + 3] = px[3]
    return w, h, ch, bytes(out)


def decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode any supported payload; raises ImageFormatError otherwise."""
    kind = sniff(data)
    if kind == "png":
        return decode_png(data)
    if kind == "bmp":
        return decode_bmp(data)
    raise ImageFormatError("unrecognized image payload (PNG/BMP supported)")


def encode_png(w: int, h: int, channels: int, pixels: bytes) -> bytes:
    """Minimal PNG writer (filter 0 rows, one IDAT) — the re-encode
    side of the real resize kernel."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(h)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    w: int, h: int, channels: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample (numpy when present)."""
    try:
        import numpy as np

        arr = np.frombuffer(pixels, np.uint8).reshape(h, w, channels)
        ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
        xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
        return arr[ys][:, xs].tobytes()
    except ImportError:  # pragma: no cover - numpy is baked in
        out = bytearray(new_w * new_h * channels)
        for y in range(new_h):
            sy = min(h - 1, y * h // new_h)
            for x in range(new_w):
                sx = min(w - 1, x * w // new_w)
                src = (sy * w + sx) * channels
                dst = (y * new_w + x) * channels
                out[dst : dst + channels] = pixels[src : src + channels]
        return bytes(out)
