"""Property-based round-trip tests for the from-scratch codecs.

Hypothesis drives shapes/content through the BMP/PNG/WAV/AVI encoders and
the PDF literal-string escaper; decode(encode(x)) == x must hold for every
draw (the PNG encoder cycles all five filters, so tall images exercise
every decoder path).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def images(draw, max_side=24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=25, deadline=None)
@given(images())
def test_bmp_roundtrip(px):
    from engine.ops.codecs import decode_bmp, encode_bmp

    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=25, deadline=None)
@given(images())
def test_png_roundtrip(px):
    from engine.ops.codecs import decode_png, encode_png

    assert np.array_equal(decode_png(encode_png(px)), px)


@st.composite
def smooth_images(draw, max_side=24):
    """Low-frequency content (JPEG is lossy; smooth images bound the error)."""
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    a = draw(st.integers(0, 3))
    b = draw(st.integers(0, 3))
    base = draw(st.integers(0, 255))
    yy, xx = np.mgrid[0:h, 0:w]
    plane = base + a * yy + b * xx
    return np.stack([np.clip(plane, 0, 255), np.clip(plane - 40, 0, 255),
                     np.clip(plane - 90, 0, 255)], axis=-1).astype(np.uint8)


@settings(max_examples=25, deadline=None)
@given(smooth_images(), st.sampled_from(["444", "422", "420"]),
       st.sampled_from([0, 2]))
def test_jpeg_roundtrip_lossy(px, subsample, restart_interval):
    from engine.ops.codecs import decode_jpeg, encode_jpeg

    out = decode_jpeg(encode_jpeg(px, quality=95, subsample=subsample,
                                  restart_interval=restart_interval))
    assert out.shape == px.shape
    # clipped linear gradients survive quality-95 DCT within a small bound
    err = np.abs(out.astype(int) - px.astype(int))
    assert float(err.mean()) <= 8.0 and int(err.max()) <= 64


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 5000), st.sampled_from([8000, 16000, 44100]),
       st.integers(0, 2**31 - 1))
def test_wav_roundtrip(n, rate, seed):
    from engine.ops.codecs import decode_wav, encode_wav

    s = np.random.default_rng(seed).integers(-32768, 32767, size=n).astype(np.int16)
    out, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate
    assert np.array_equal(out, s)


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 8), st.integers(1, 16), st.integers(1, 16),
       st.sampled_from([5, 10, 24]), st.integers(0, 2**31 - 1))
def test_avi_roundtrip(n, h, w, fps, seed):
    from engine.ops.codecs import decode_avi, encode_avi

    fr = np.random.default_rng(seed).integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    out, got_fps = decode_avi(encode_avi(fr, fps))
    assert got_fps == fps
    assert np.array_equal(out, fr)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60))
def test_pdf_string_escape_roundtrip(s):
    from engine.pdf import _escape_pdf_string, _read_literal_string

    enc = b"(" + _escape_pdf_string(s) + b")"
    got, end = _read_literal_string(enc, 0)
    assert got == s
    assert end == len(enc)


@settings(max_examples=20, deadline=None)
@given(images(max_side=30), st.integers(1, 12), st.integers(1, 12))
def test_resize_nearest_properties(px, out_w, out_h):
    from engine.ops.codecs import resize_nearest

    small = resize_nearest(px, out_w, out_h)
    assert small.shape == (out_h, out_w, 3)
    assert (small[0, 0] == px[0, 0]).all()  # origin preserved
    # every output pixel exists somewhere in the source
    src_px = {tuple(p) for row in px for p in row}
    assert all(tuple(p) in src_px for row in small for p in row)


def test_bmp_core_header_decodes():
    """BITMAPCOREHEADER (OS/2 1.x, 12-byte header) 24-bit BMPs decode to the
    same pixels as the BITMAPINFOHEADER encoding (round-3 boundary closure)."""
    import struct

    from engine.ops.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(5, 3, 3)).astype(np.uint8)
    h, w = px.shape[:2]
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    body = bytearray()
    bgr = px[:, :, ::-1]
    for r in range(h - 1, -1, -1):  # bottom-up
        body += bgr[r].tobytes() + b"\x00" * (stride - row_bytes)
    core = struct.pack("<IhhHH", 12, w, h, 1, 24)
    off = 14 + len(core)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    data = hdr + core + bytes(body)
    got = decode_bmp(data)
    assert np.array_equal(got, px)
    # and it agrees with the modern-header encoder round-trip
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_wav_float32_and_pcm8_decode():
    """fmt=3 float32 and 8-bit PCM WAVs decode to int16 with the documented
    scaling; channel 0 kept for multi-channel (round-3 boundary closure)."""
    import struct

    from engine.ops.codecs import decode_wav

    def wav(fmt, channels, rate, bits, payload):
        fmtc = struct.pack("<HHIIHH", fmt, channels, rate,
                           rate * channels * bits // 8, channels * bits // 8, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        chunks += b"data" + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    f = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 2.0], dtype="<f4")  # 2.0 clips
    s, rate = decode_wav(wav(3, 1, 16000, 32, f.tobytes()))
    assert rate == 16000
    assert s.tolist() == [0, 16384, -16384, 32767, -32767, 32767]

    u8 = np.array([128, 255, 0, 200], dtype=np.uint8)
    s, rate = decode_wav(wav(1, 1, 8000, 8, u8.tobytes()))
    assert s.tolist() == [0, 127 << 8, -(128 << 8), 72 << 8]

    # stereo float: keep channel 0
    st = np.array([0.25, -0.75, -0.25, 0.75], dtype="<f4")  # L R L R
    s, _ = decode_wav(wav(3, 2, 8000, 32, st.tobytes()))
    assert s.tolist() == [8192, -8192]


def test_jpeg_sharp_image_error_bound():
    """Regression for the quant-table permutation bug: on a RANDOM (all-AC)
    image the q90 round-trip error must be quantization-sized.  The buggy
    decoder (zigzag coefs x natural-order qt) read ~37 mean abs error here;
    the correct pairing reads ~6.  Smooth-gradient tolerances cannot see
    this class of bug (their AC energy is near zero)."""
    from engine.ops.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    err = float(np.abs(out.astype(int) - px.astype(int)).mean())
    assert err <= 12.0, err


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 40), st.integers(1, 40),
       st.sampled_from(["444", "422", "420"]))
def test_jpeg_progressive_bit_identical_to_baseline(seed, h, w, subsample):
    """Progressive and baseline share the quantizer, so decoding the
    progressive bytes must reproduce the baseline decode EXACTLY — this
    locks every scan type (DC first/refine, two AC bands first/refine,
    EOB handling) against the sequential path."""
    from engine.ops.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=90, subsample=subsample))
    prog = decode_jpeg(encode_jpeg(px, quality=90, subsample=subsample,
                                   progressive=True))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_eobn_run_spans_blocks():
    """Our encoder only ever emits EOB0, so the general EOBn path is locked
    by a hand-assembled single-component progressive stream: an EOB1 run
    (eobrun = 2 + 1 appended bit) covering three blocks must decode exactly
    like the equivalent three-EOB0 stream."""
    import struct

    from engine.ops.codecs import (_BitWriter, _HT_DC_LUM, _ZIGZAG,
                                   _huff_codes, decode_jpeg)

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # custom AC table: three 2-bit codes for 0x00 (EOB0), 0x11 (r=1,s=1),
    # 0x10 (EOB1: eobrun = 2 + 1 extra bit)
    ac_bits = [0, 3] + [0] * 14
    ac_vals = [0x00, 0x11, 0x10]
    ac_tab = _huff_codes(ac_bits, ac_vals)
    dc_tab = _huff_codes(*_HT_DC_LUM)

    def build(jpeg_scans):
        out = bytearray(b"\xff\xd8")
        out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # qt 0: all ones
        out += seg(0xC2, struct.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0]))
        out += seg(0xC4, bytes([0x00]) + bytes(_HT_DC_LUM[0]) + bytes(_HT_DC_LUM[1]))
        out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        for scomp, ss, se, ahal, data in jpeg_scans:
            out += seg(0xDA, bytes([1, scomp[0], scomp[1], ss, se, ahal])) + data
        out += b"\xff\xd9"
        return bytes(out)

    # DC first scan: 3 blocks, diff 0 each (cat 0)
    wdc = _BitWriter()
    for _ in range(3):
        code, ln = dc_tab[0]
        wdc.write(code, ln)
    wdc.flush()

    # AC scan A: block0 = [skip 1, coef=1 at k=2] then EOB1 run of 3 blocks
    wa = _BitWriter()
    code, ln = ac_tab[0x11]; wa.write(code, ln); wa.write(1, 1)  # v=+1 at k=2
    code, ln = ac_tab[0x10]; wa.write(code, ln); wa.write(1, 1)  # eobrun=2+1
    wa.flush()

    # AC scan B: same coefficients via three EOB0-terminated blocks
    wb = _BitWriter()
    code, ln = ac_tab[0x11]; wb.write(code, ln); wb.write(1, 1)
    code, ln = ac_tab[0x00]; wb.write(code, ln)
    code, ln = ac_tab[0x00]; wb.write(code, ln)
    code, ln = ac_tab[0x00]; wb.write(code, ln)
    wb.flush()

    dc_scan = ((1, 0x00), 0, 0, 0x00, wdc.buf)
    a = decode_jpeg(build([dc_scan, ((1, 0x00), 1, 63, 0x00, wa.buf)]))
    b = decode_jpeg(build([dc_scan, ((1, 0x00), 1, 63, 0x00, wb.buf)]))
    assert np.array_equal(a, b)
    assert a.shape == (8, 24, 3)
    # the planted coef at zigzag index 2 is non-DC: the image is NOT flat
    assert len(np.unique(a[:, :8, 0])) > 1
    assert _ZIGZAG[2] == 8  # sanity: zigzag 2 -> natural (1,0)


@st.composite
def paletted_images(draw, max_side=32, max_colors=16):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    n = draw(st.integers(1, max_colors))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    return pal[rng.integers(0, n, (h, w))]


@settings(max_examples=25, deadline=None)
@given(paletted_images())
def test_bmp_rle8_roundtrip(px):
    from engine.ops.codecs import decode_bmp, encode_bmp_rle8

    assert np.array_equal(decode_bmp(encode_bmp_rle8(px)), px)


def test_bmp_rle8_delta_escape():
    """Our encoder never emits the 0,2 delta escape; lock the decoder's
    delta path with a hand-assembled stream: a 4x4 image where a delta jump
    (dx=2, dy=1) skips cells that must stay at palette index 0."""
    import struct

    from engine.ops.codecs import decode_bmp

    # palette: 0 -> black, 1 -> white
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0]) + b"\x00" * (4 * 254)
    # bottom-up rows: run of 2 white at (0,0) leaves x=2; delta dx=0,dy=1
    # jumps to (2,1); run of 2 white; EOL; EOB
    body = bytes([2, 1, 0, 2, 0, 1, 2, 1, 0, 0, 0, 1])
    off = 14 + 40 + 1024
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, len(body),
                       2835, 2835, 256, 0)
    px = decode_bmp(hdr + info + pal + body)
    want = np.zeros((4, 4, 3), np.uint8)
    want[3, 0:2] = 255   # bottom row (y=0 bottom-up), x 0-1
    want[2, 2:4] = 255   # after delta dx=2 dy=1: y=1 bottom-up, x 2-3
    assert np.array_equal(px, want)


def test_gif_roundtrip_property():
    """decode(encode(idx, pal)) == pal[idx] across palette sizes (forces
    every LZW code width 3..9), the 1x1 edge, and a >4096-code stream that
    crosses the dictionary-reset path; sniff + media_info dispatch."""
    import numpy as np

    from engine.ops.codecs import decode_gif, encode_gif, media_info, sniff

    rng = np.random.default_rng(7)
    for n_colors, shape in ((3, (5, 7)), (64, (40, 50)), (256, (80, 90)),
                            (2, (1, 1)), (5, (200, 300))):
        pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
        idx = rng.integers(0, n_colors, size=shape, dtype=np.uint8)
        data = encode_gif(idx, pal)
        assert sniff(data) == "gif"
        assert (decode_gif(data) == pal[idx]).all()
        info = media_info(data)
        assert (info["kind"], info["width"], info["height"]) == (
            "gif", shape[1], shape[0])
    # dictionary reset: repetitive stream growing past 4096 codes
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = np.tile(rng.integers(0, 16, size=(10, 1000), dtype=np.uint8), (20, 1))
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()
    # 4-pass interlace roundtrip across heights hitting every pass pattern
    for shape in ((1, 1), (2, 3), (7, 5), (8, 8), (9, 4), (33, 17)):
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=shape, dtype=np.uint8)
        assert (decode_gif(encode_gif(idx, pal, interlace=True))
                == pal[idx]).all()


# ---------------------------------------------------------------------------
# CCITT Group 4 (T.6 MMR) — engine.ops.codecs.encode/decode_ccitt_g4
# ---------------------------------------------------------------------------


def test_ccitt_g4_known_bit_vectors():
    """Hand-derived T.6 encodings (external anchor, not a round-trip):
    an all-white 1x8 row codes as V0 + EOFB; a 3-white/2-black/3-white row
    as Horizontal + white-term-3 '1000' + black-term-2 '11' + V0 + EOFB."""
    import numpy as np

    from engine.ops.codecs import encode_ccitt_g4

    bits = "".join(f"{b:08b}" for b in encode_ccitt_g4(np.zeros((1, 8), np.uint8)))
    assert bits.startswith("1" + "000000000001" * 2)
    row = np.array([[0, 0, 0, 1, 1, 0, 0, 0]], np.uint8)
    bits = "".join(f"{b:08b}" for b in encode_ccitt_g4(row))
    assert bits.startswith("001" + "1000" + "11" + "1" + "000000000001" * 2)


def test_ccitt_g4_roundtrip_property():
    import numpy as np

    from engine.ops.codecs import decode_ccitt_g4, encode_ccitt_g4

    rng = np.random.default_rng(7)
    for trial in range(25):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 90))
        if trial % 3 == 0:
            bits = (rng.random((h, w)) < 0.5).astype(np.uint8)  # noise
        else:
            bits = np.zeros((h, w), np.uint8)  # scanned-doc-like runs
            for _ in range(int(rng.integers(0, 10))):
                y = int(rng.integers(0, h))
                x0 = int(rng.integers(0, w))
                bits[y, x0 : min(w, x0 + int(rng.integers(1, 30)))] = 1
        dec = decode_ccitt_g4(encode_ccitt_g4(bits), w, h, black_is_1=True)
        assert (dec == bits).all(), (trial, h, w)
    # /BlackIs1 default false: samples are INVERTED (0 = black)
    pat = np.eye(6, 9, dtype=np.uint8)
    assert (decode_ccitt_g4(encode_ccitt_g4(pat), 9, 6) == 1 - pat).all()


def test_ccitt_g4_long_runs_makeup_codes():
    import numpy as np

    from engine.ops.codecs import decode_ccitt_g4, encode_ccitt_g4

    # exercise makeup codes incl. the shared >1728 extensions
    for w in (64, 65, 1728, 1729, 2560, 2561, 3000):
        row = np.ones((1, w), np.uint8)
        assert (decode_ccitt_g4(encode_ccitt_g4(row), w, 1, black_is_1=True)
                == row).all()
        half = np.zeros((2, w), np.uint8)
        half[:, w // 2 :] = 1
        assert (decode_ccitt_g4(encode_ccitt_g4(half), w, 2, black_is_1=True)
                == half).all()
