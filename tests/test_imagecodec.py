"""Pure-stdlib PNG/BMP codec tests (ops/imagecodec.py) and the real
(non-fake) multimodal decode/resize kernels built on it.

The PNG filter paths (Sub/Up/Average/Paeth) are exercised by FORWARD
filtering known pixels here in the test — an independent implementation
of the spec's filter direction — so decoder bugs can't self-verify."""

import struct
import zlib

import pytest

from filefilter_spark.ops import imagecodec as ic


def _px(w, h, ch, seed=0):
    return bytes((seed + 7 * i) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(ch):
    w, h = 13, 7  # odd sizes: no accidental stride alignment
    pixels = _px(w, h, ch)
    data = ic.encode_png(w, h, ch, pixels)
    assert ic.sniff(data) == "png"
    got = ic.decode_png(data)
    assert got == (w, h, ch, pixels)


def _forward_filter(pixels, w, h, ch, filt):
    """Spec-direction filtering (encoder side), independent of the
    decoder's unfilter loop."""
    stride = w * ch
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pixels[y * stride : (y + 1) * stride]
        out.append(filt)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if filt == 1:
                out.append((line[i] - left) & 0xFF)
            elif filt == 2:
                out.append((line[i] - up) & 0xFF)
            elif filt == 3:
                out.append((line[i] - ((left + up) >> 1)) & 0xFF)
            elif filt == 4:
                out.append((line[i] - ic._paeth(left, up, ul)) & 0xFF)
        prev = line
    return bytes(out)


@pytest.mark.parametrize("filt", [1, 2, 3, 4])
def test_png_unfilters_every_filter_type(filt):
    w, h, ch = 9, 5, 3
    pixels = _px(w, h, ch, seed=filt)
    raw = _forward_filter(pixels, w, h, ch, filt)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert ic.decode_png(data) == (w, h, ch, pixels)


def test_png_palette_expands_to_rgb():
    w, h = 4, 2
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = bytes([0, 1, 2, 0, 2, 1, 0, 0])
    raw = b"".join(b"\x00" + idx[y * w : (y + 1) * w] for y in range(h))

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got_w, got_h, got_ch, px = ic.decode_png(data)
    assert (got_w, got_h, got_ch) == (w, h, 3)
    assert px[:9] == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])


def _make_bmp(w, h, rows_bgr, bottom_up=True):
    """rows_bgr: top-down list of rows, each a list of (b, g, r)."""
    row_bytes = (w * 3 + 3) & ~3
    body = b""
    order = reversed(rows_bgr) if bottom_up else rows_bgr
    for row in order:
        line = b"".join(bytes(p) for p in row)
        body += line + b"\x00" * (row_bytes - len(line))
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24,
                      0, len(body), 2835, 2835, 0, 0)
    )
    return hdr + body


@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp_decode_orientation_and_bgr_swap(bottom_up):
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],  # top row: blue,green,red in BGR
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    data = _make_bmp(3, 2, rows, bottom_up)
    assert ic.sniff(data) == "bmp"
    w, h, ch, px = ic.decode_bmp(data)
    assert (w, h, ch) == (3, 2, 3)
    # first decoded pixel is the TOP-left regardless of storage order,
    # already swapped to RGB
    assert px[:3] == bytes([0, 0, 255])
    assert px[-3:] == bytes([90, 80, 70])


def test_unsupported_payloads_raise():
    with pytest.raises(ic.ImageFormatError):
        ic.decode(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ic.ImageFormatError):
        ic.decode(b"")


def test_resize_nearest_identity_and_downscale():
    w, h, ch = 8, 8, 3
    px = _px(w, h, ch)
    assert ic.resize_nearest(w, h, ch, px, 8, 8) == px
    small = ic.resize_nearest(w, h, ch, px, 4, 4)
    assert len(small) == 4 * 4 * ch
    assert small[:ch] == px[:ch]  # top-left pixel preserved


def test_real_decode_and_resize_kernels_in_spark(spark):
    """End-to-end on the real (fake=False) kernels: PNG payloads built
    by the codec, decoded and resized through the mapInPandas plumbing."""
    from filefilter_spark.ops.multimodal import (
        extract_image_features, resize_images_stub, to_media_table,
    )

    rows = [
        (1, ic.encode_png(16, 9, 3, _px(16, 9, 3, seed=1))),
        (2, ic.encode_png(5, 5, 4, _px(5, 5, 4, seed=2))),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    media = to_media_table(df, "id", "payload")

    feats = {r["media_id"]: r for r in extract_image_features(media, fake=False).collect()}
    assert (feats[1]["width"], feats[1]["height"], feats[1]["n_channels"]) == (16, 9, 3)
    assert (feats[2]["width"], feats[2]["height"], feats[2]["n_channels"]) == (5, 5, 4)

    resized = {r["media_id"]: r for r in
               resize_images_stub(media, width=4, height=4, fake=False).collect()}
    w, h, ch, px = ic.decode_png(bytes(resized[1]["content"]))
    assert (w, h, ch) == (4, 4, 3)
    # nearest-neighbor: top-left pixel of the source survives
    assert px[:3] == _px(16, 9, 3, seed=1)[:3]


# ---------------------------------------------------------------------------
# Baseline JPEG (fixtures generated by tests/fixtures/jpeg/MakeJpeg.java;
# .rgb files are Java ImageIO's decoded samples — an INDEPENDENT decoder,
# so ours can't self-verify)
# ---------------------------------------------------------------------------

import os

_JPEG_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")


def _jpeg_case(name):
    with open(os.path.join(_JPEG_FIX, f"{name}.jpg"), "rb") as f:
        data = f.read()
    with open(os.path.join(_JPEG_FIX, f"{name}.rgb"), "rb") as f:
        ref = f.read()
    return data, ref


@pytest.mark.parametrize(
    "name,w,h,ch,mean_tol,p99_tol",
    [
        # 4:2:0, non-MCU-aligned dims: replication vs ImageIO's smooth
        # chroma upsampling differs most at color edges
        ("rgb_q85", 37, 23, 3, 3.5, 10),
        ("rgb_q95", 64, 48, 3, 2.0, 6),
        # single-component: no chroma path, near-exact (IDCT rounding only)
        ("gray_q90", 32, 32, 1, 0.5, 1),
        # progressive (SOF2): DC first/refine + AC spectral bands with
        # successive approximation and EOB runs
        ("prog_rgb_q85", 45, 29, 3, 3.5, 10),
        ("prog_gray_q90", 32, 32, 1, 0.5, 1),
    ],
)
def test_jpeg_decode_vs_independent_decoder(name, w, h, ch, mean_tol, p99_tol):
    import numpy as np

    data, ref = _jpeg_case(name)
    assert ic.sniff(data) == "jpeg"
    got_w, got_h, got_ch, px = ic.decode(data)
    assert (got_w, got_h, got_ch) == (w, h, ch)
    got = np.frombuffer(px, np.uint8).astype(np.int16)
    want = np.frombuffer(ref, np.uint8).astype(np.int16)
    assert got.shape == want.shape
    diff = np.abs(got - want)
    assert diff.mean() <= mean_tol, f"mean {diff.mean():.2f}"
    assert np.percentile(diff, 99) <= p99_tol, f"p99 {np.percentile(diff, 99)}"


def test_jpeg_progressive_matches_sequential_exactly():
    """The same 32x32 gray pattern encoded sequentially and
    progressively must decode to IDENTICAL pixels — the two entropy
    paths (baseline full-band vs DC/AC bands + successive
    approximation) reconstruct the same coefficients."""
    seq, _ = _jpeg_case("gray_q90")
    prog, _ = _jpeg_case("prog_gray_q90")
    assert ic.decode_jpeg(seq) == ic.decode_jpeg(prog)


def test_jpeg_arithmetic_rejected():
    data, _ = _jpeg_case("gray_q90")
    # flip SOF0 -> SOF9 (arithmetic sequential): genuinely unsupported
    i = data.find(b"\xff\xc0")
    assert i > 0
    mangled = data[:i] + b"\xff\xc9" + data[i + 2:]
    with pytest.raises(ic.ImageFormatError, match="coding process"):
        ic.decode_jpeg(mangled)


def test_jpeg_truncated_rejected():
    data, _ = _jpeg_case("gray_q90")
    with pytest.raises(ic.ImageFormatError):
        ic.decode_jpeg(data[:20])


def test_jpeg_through_real_decode_kernel(spark):
    """End-to-end through the mapInPandas kernel with fake=False —
    the exact path OP-D6-decode-jpeg registers."""
    from filefilter_spark.ops.multimodal import extract_image_features, to_media_table

    data, _ = _jpeg_case("rgb_q85")
    df = spark.createDataFrame([(1, data)], "media_id long, payload binary")
    rows = extract_image_features(
        to_media_table(df, "media_id", "payload"), fake=False
    ).collect()
    assert [(r.media_id, r.width, r.height, r.n_channels) for r in rows] == [
        (1, 37, 23, 3)
    ]


def test_jpeg_corrupt_payloads_raise_format_error_only():
    """Single-byte mutations and truncations of a real JPEG must either
    decode (entropy streams tolerate some flips) or raise
    ImageFormatError — never IndexError/struct.error — so the kernel's
    bad-row policy stays reachable on a dirty 100 TB scrape."""
    import random

    cases = []
    for fixture in ("rgb_q85", "prog_rgb_q85"):
        data, _ = _jpeg_case(fixture)
        rng = random.Random(7)
        cases += [data[:n] for n in (0, 1, 2, 3, 19, 150, len(data) - 1)]
        for _ in range(200):
            b = bytearray(data)
            pos = rng.randrange(len(b))
            b[pos] ^= 1 << rng.randrange(8)
            cases.append(bytes(b))
    for payload in cases:
        try:
            w, h, ch, px = ic.decode_jpeg(payload)
            assert len(px) == w * h * ch
        except ic.ImageFormatError:
            pass


# ---------------------------------------------------------------------------
# GIF (fixtures from tests/fixtures/gif/MakeGif.java; palette lookup is
# lossless so the comparison vs Java ImageIO is byte-EXACT)
# ---------------------------------------------------------------------------

_GIF_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "gif")


@pytest.mark.parametrize("name,w,h", [("grad_41x27", 41, 27), ("grad_64x64", 64, 64)])
def test_gif_decode_exact_vs_independent_decoder(name, w, h):
    with open(os.path.join(_GIF_FIX, f"{name}.gif"), "rb") as f:
        data = f.read()
    with open(os.path.join(_GIF_FIX, f"{name}.rgb"), "rb") as f:
        ref = f.read()
    assert ic.sniff(data) == "gif"
    got_w, got_h, ch, px = ic.decode(data)
    assert (got_w, got_h, ch) == (w, h, 3)
    assert px == ref  # palette lookup is lossless: byte-exact


def _encode_gif_uncompressed(w, h, indices, palette_bits, interlaced):
    """Minimal valid GIF writer for decoder tests: the classic
    'uncompressed LZW' trick — emit CLEAR often enough that the code
    table never grows, so every index is a literal code. An independent
    forward implementation of the bit packing + interlace reorder."""
    import struct as st

    n = 2 << (palette_bits - 1)
    palette = bytes(b for i in range(n) for b in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256))
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", w, h, 0x80 | (palette_bits - 1), 0, 0)
    out += palette
    out += st.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlaced else 0)
    min_code = max(2, palette_bits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    if interlaced:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        seq = [indices[y * w + x] for y in order for x in range(w)]
    else:
        seq = list(indices)
    codes = [clear]
    for i, c in enumerate(seq):
        codes.append(c)
        # table grows by one per emitted code; clear before width bump
        if i % ((1 << width) - clear - 3) == ((1 << width) - clear - 4):
            codes.append(clear)
    codes.append(end)
    buf = nbits = 0
    stream = bytearray()
    for c in codes:
        buf |= c << nbits
        nbits += width
        while nbits >= 8:
            stream.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        stream.append(buf & 0xFF)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


@pytest.mark.parametrize("interlaced", [False, True])
def test_gif_interlace_and_lzw_width_handling(interlaced):
    w, h = 19, 13
    indices = bytes((x + y * 3) % 8 for y in range(h) for x in range(w))
    data = _encode_gif_uncompressed(w, h, indices, palette_bits=3, interlaced=interlaced)
    got_w, got_h, ch, px = ic.decode_gif(data)
    assert (got_w, got_h, ch) == (w, h, 3)
    # reconstruct expected RGB from the test palette
    want = bytes(
        b for i in indices for b in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256)
    )
    assert px == want


def test_gif_corrupt_rejected():
    with open(os.path.join(_GIF_FIX, "grad_41x27.gif"), "rb") as f:
        data = f.read()
    with pytest.raises(ic.ImageFormatError):
        ic.decode_gif(data[:40])  # truncated mid-stream
    with pytest.raises(ic.ImageFormatError):
        ic.decode_gif(b"GIF89a" + b"\x00" * 20)  # no image block


# ---------------------------------------------------------------------------
# TIFF (fixtures from tests/fixtures/tiff/MakeTiff.java; all supported
# compressions are lossless so comparisons are byte-EXACT)
# ---------------------------------------------------------------------------

_TIFF_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tiff")


@pytest.mark.parametrize(
    "name,w,h,ch",
    [
        ("rgb_none", 33, 21, 3),       # uncompressed
        ("rgb_lzw", 33, 21, 3),        # TIFF LZW (MSB-first, EarlyChange)
        ("rgb_deflate", 40, 30, 3),    # zlib strips
        ("gray_packbits", 24, 24, 1),  # RLE
    ],
)
def test_tiff_decode_exact_vs_independent_decoder(name, w, h, ch):
    with open(os.path.join(_TIFF_FIX, f"{name}.tif"), "rb") as f:
        data = f.read()
    with open(os.path.join(_TIFF_FIX, f"{name}.rgb"), "rb") as f:
        ref = f.read()
    assert ic.sniff(data) == "tiff"
    got_w, got_h, got_ch, px = ic.decode(data)
    assert (got_w, got_h, got_ch) == (w, h, ch)
    assert px == ref


def test_tiff_identical_content_across_compressions():
    """none and LZW fixtures encode the same pattern — decoded bytes
    must agree with each other, not just each with its own reference."""
    a = ic.decode(open(os.path.join(_TIFF_FIX, "rgb_none.tif"), "rb").read())
    b = ic.decode(open(os.path.join(_TIFF_FIX, "rgb_lzw.tif"), "rb").read())
    assert a == b


def test_packbits_spec_cases():
    from filefilter_spark.ops.imagecodec import _packbits_decode

    # literal run: n=2 -> 3 literal bytes; repeat: n=254 -> 3 copies
    assert _packbits_decode(bytes([2, 10, 20, 30, 254, 7]), 6) == bytes(
        [10, 20, 30, 7, 7, 7]
    )
    assert _packbits_decode(bytes([128, 0, 65]), 1) == b"A"  # 128 = no-op


def test_tiff_corrupt_rejected():
    with open(os.path.join(_TIFF_FIX, "rgb_lzw.tif"), "rb") as f:
        data = f.read()
    with pytest.raises(ic.ImageFormatError):
        ic.decode_tiff(data[:60])
    with pytest.raises(ic.ImageFormatError):
        ic.decode_tiff(b"II*\x00\x08\x00\x00\x00" + b"\x00" * 4)  # empty IFD


# ---------------------------------------------------------------------------
# Baseline JPEG ENCODER — the test rig for decode paths no public
# encoder emits by default (restart markers), cross-validated both ways
# ---------------------------------------------------------------------------


def _grad(w, h, ch):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            r = (x * 255) // max(1, w - 1)
            g = (y * 255) // max(1, h - 1)
            b = 200 if (x + y) % 2 == 0 else 40
            out += bytes([r, g, b][:ch] if ch == 3 else [(r + g) // 2])
    return bytes(out)


@pytest.mark.parametrize(
    "w,h,ch,ri,max_err",
    [
        (24, 16, 3, 0, 6),   # no restarts
        (24, 16, 3, 2, 6),   # RSTn every 2 MCUs
        (37, 23, 3, 3, 6),   # restarts + non-MCU-aligned dims
        (32, 32, 1, 4, 2),   # grayscale + restarts
    ],
)
def test_jpeg_encode_decode_roundtrip(w, h, ch, ri, max_err):
    import numpy as np

    px = _grad(w, h, ch)
    data = ic.encode_jpeg(w, h, ch, px, quant=4, restart_interval=ri)
    assert ic.sniff(data) == "jpeg"
    if ri:
        assert b"\xff\xdd" in data  # DRI segment
        assert b"\xff\xd0" in data  # at least one RST0
    gw, gh, gch, got = ic.decode_jpeg(data)
    assert (gw, gh, gch) == (w, h, ch)
    d = np.abs(
        np.frombuffer(got, np.uint8).astype(int)
        - np.frombuffer(px, np.uint8).astype(int)
    )
    assert d.max() <= max_err, f"max {d.max()}"


def test_jpeg_encode_restart_equivalence():
    """Restart markers only re-sync the entropy stream — with or
    without them the decoded pixels must be IDENTICAL (same
    coefficients, byte-aligned differently)."""
    px = _grad(24, 16, 3)
    plain = ic.encode_jpeg(24, 16, 3, px, quant=4, restart_interval=0)
    rst = ic.encode_jpeg(24, 16, 3, px, quant=4, restart_interval=2)
    assert ic.decode_jpeg(plain) == ic.decode_jpeg(rst)


def test_jpeg_encoder_output_accepted_by_independent_decoder(tmp_path):
    """ImageIO must decode our encoder's output — including a
    DRI/RSTn stream — and agree with our decoder within IDCT
    tolerance. Skipped when no JDK is available."""
    import shutil
    import subprocess

    import numpy as np

    if not (shutil.which("java") and shutil.which("javac")):
        pytest.skip("no JDK in environment")
    src = tmp_path / "Dump.java"
    src.write_text(
        'import javax.imageio.ImageIO;import java.awt.image.BufferedImage;'
        'import java.io.*;public class Dump{public static void main(String[] a)'
        'throws Exception{BufferedImage i=ImageIO.read(new File(a[0]));'
        'DataOutputStream o=new DataOutputStream(new FileOutputStream(a[1]));'
        'for(int y=0;y<i.getHeight();y++)for(int x=0;x<i.getWidth();x++)'
        'for(int c=0;c<i.getRaster().getNumBands();c++)'
        'o.writeByte(i.getRaster().getSample(x,y,c));o.close();}}'
    )
    subprocess.run(["javac", str(src)], check=True, cwd=tmp_path)
    px = _grad(24, 16, 3)
    jpg = tmp_path / "t.jpg"
    jpg.write_bytes(ic.encode_jpeg(24, 16, 3, px, quant=4, restart_interval=2))
    ref = tmp_path / "t.ref"
    subprocess.run(
        ["java", "Dump", str(jpg), str(ref)], check=True, cwd=tmp_path
    )
    _, _, _, ours = ic.decode_jpeg(jpg.read_bytes())
    d = np.abs(
        np.frombuffer(ours, np.uint8).astype(int)
        - np.frombuffer(ref.read_bytes(), np.uint8).astype(int)
    )
    assert d.max() <= 2, f"max {d.max()}"


def test_jpeg_encode_validation():
    with pytest.raises(ValueError):
        ic.encode_jpeg(4, 4, 2, bytes(32))  # 2 channels unsupported
    with pytest.raises(ValueError):
        ic.encode_jpeg(4, 4, 1, bytes(16), quant=0)


def test_resize_to_jpeg_kernel(spark):
    """Real resize with JPEG output: decode any format, resample,
    re-encode via the baseline encoder; RGBA input drops alpha."""
    from filefilter_spark.ops.multimodal import resize_images_stub, to_media_table

    rows = [
        (1, ic.encode_png(16, 9, 3, _px(16, 9, 3, seed=1))),
        (2, ic.encode_png(5, 5, 4, _px(5, 5, 4, seed=2))),  # RGBA
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    media = to_media_table(df, "id", "payload")
    out = {r["media_id"]: r for r in resize_images_stub(
        media, width=8, height=8, fake=False, out_format="jpeg"
    ).collect()}
    for mid in (1, 2):
        w, h, ch, px = ic.decode_jpeg(bytes(out[mid]["content"]))
        assert (w, h, ch) == (8, 8, 3)
    with pytest.raises(ValueError, match="out_format"):
        resize_images_stub(media, fake=False, out_format="webp")


def test_png_palette_index_out_of_bounds_raises():
    """A palette index past PLTE must raise, not silently shrink the
    output buffer via a short slice assignment."""
    import struct
    import zlib

    from filefilter_spark.ops.imagecodec import ImageFormatError, decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)  # 2x1 palette
    plte = bytes([10, 20, 30])  # ONE entry; index 1 is out of bounds
    raw = bytes([0, 0, 1])      # filter 0, indices 0 and 1
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ImageFormatError, match="palette index"):
        decode_png(data)


def test_png_bomb_geometry_refused():
    """A crafted IHDR declaring a huge image must refuse before
    allocating, not OOM the executor."""
    import struct
    import zlib

    from filefilter_spark.ops.imagecodec import ImageFormatError, decode_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 6, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\0")) + chunk(b"IEND", b""))
    with pytest.raises(ImageFormatError, match="implausible PNG geometry"):
        decode_png(data)


def test_jpeg_fill_bytes_before_marker_accepted():
    """T.81 B.1.1.2: repeated 0xFF fill bytes before a marker are legal
    encoder padding and must not desync the parser."""
    from filefilter_spark.ops.imagecodec import decode, encode_jpeg

    good = encode_jpeg(4, 4, 1, bytes(range(16)))
    # inject a fill byte before the DQT marker (first FF after SOI+APP0?
    # encode_jpeg layout: SOI then DQT) — find the first marker after SOI
    i = good.index(b"\xff\xdb")
    padded = good[:i] + b"\xff" + good[i:]
    w1, h1, c1, px1 = decode(good)
    w2, h2, c2, px2 = decode(padded)
    assert (w1, h1, c1, px1) == (w2, h2, c2, px2)


def test_tiff_unsupported_photometric_refused(tmp_path):
    """CMYK/YCbCr TIFFs must refuse loudly, not decode byte-wise into
    mislabeled RGB."""
    import struct

    from filefilter_spark.ops.imagecodec import ImageFormatError, decode_tiff

    # minimal little-endian TIFF: 1x1, 4 samples, photometric 5 (CMYK)
    def entry(tag, typ, count, val):
        return struct.pack("<HHII", tag, typ, count, val)

    px_off = 8 + 2 + 10 * 12 + 4
    ifd = b"".join([
        entry(256, 3, 1, 1),      # width
        entry(257, 3, 1, 1),      # height
        entry(258, 3, 1, 8),      # bits (single value 8)
        entry(259, 3, 1, 1),      # no compression
        entry(262, 3, 1, 5),      # photometric: separated/CMYK
        entry(273, 4, 1, px_off), # strip offset
        entry(277, 3, 1, 4),      # samples per pixel
        entry(278, 3, 1, 1),      # rows per strip
        entry(279, 4, 1, 4),      # strip byte count
        entry(284, 3, 1, 1),      # chunky
    ])
    data = (b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", 10) + ifd + struct.pack("<I", 0)
            + b"\x01\x02\x03\x04")
    with pytest.raises(ImageFormatError, match="photometric 5"):
        decode_tiff(data)


def test_decode_kernel_on_error_routing(spark):
    """Real-mode decode over a batch with one corrupt payload: 'null'
    keeps the row with null metadata, 'skip' drops it, default raises —
    one bad row must not be able to kill a corpus job unless asked."""
    from filefilter_spark.ops.imagecodec import encode_png
    from filefilter_spark.ops.multimodal import (
        extract_image_features, to_media_table,
    )

    good = encode_png(2, 2, 3, bytes(12))
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    media = to_media_table(df, "doc_id", "payload")

    nulled = {r["media_id"]: r["width"]
              for r in extract_image_features(media, fake=False,
                                              on_error="null").collect()}
    assert nulled == {1: 2, 2: None}
    skipped = extract_image_features(media, fake=False,
                                     on_error="skip").collect()
    assert [r["media_id"] for r in skipped] == [1]
    with pytest.raises(Exception, match="codec library"):
        extract_image_features(media, fake=False).collect()


def test_frame_sample_validates_every_n(spark):
    from filefilter_spark.ops.multimodal import frame_sample_stub

    with pytest.raises(ValueError, match="every_n"):
        frame_sample_stub(None, every_n=0)
