"""Property-based codec checks (hypothesis, no Spark): the pure-stdlib
codecs must hold their contracts on ARBITRARY generated media, not just
the fixture classes the driver lanes use.

- WAV: PCM roundtrip is EXACT for every depth/channel/rate combination.
- PNG: filtered encode -> decode reproduces pixels EXACTLY for every
  filter assignment.
- JPEG: decode(encode(img)) stays within the flat-q16 quantization error
  bound on arbitrary images, and is EXACT on the even-constant-block
  class whatever the block layout.
- BPE rendering: literal replace == greedy reference merge on arbitrary
  symbol sequences (the exhaustive small-alphabet test's randomized
  big-alphabet sibling).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from sparkgraft.ext import jpeg, png, wav
from tests.test_bpe import ref_merge, render


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 2),
    st.sampled_from([8000, 16000, 44100]),
    st.sampled_from([8, 16, 24, 32]),
    st.data(),
)
def test_wav_roundtrip_exact(ch, rate, depth, data):
    n_frames = data.draw(st.integers(1, 40))
    lo, hi = (0, 255) if depth == 8 else (-(1 << (depth - 1)), (1 << (depth - 1)) - 1)
    samples = data.draw(
        st.lists(
            st.integers(lo, hi),
            min_size=n_frames * ch,
            max_size=n_frames * ch,
        )
    )
    payload = wav.encode(samples, ch, rate, depth)
    d = wav.decode(payload)
    assert d["samples"] == samples
    assert (d["n_channels"], d["sample_rate"], d["bit_depth"]) == (ch, rate, depth)
    assert d["n_frames"] == n_frames


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.data())
def test_png_roundtrip_exact_under_every_filter(w, h, data):
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    d = png.decode(png.encode(w, h, pixels, color_type=0, filters=filters))
    assert d["pixels"] == pixels
    assert (d["width"], d["height"]) == (w, h)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.data())
def test_jpeg_arbitrary_image_error_bound(bw, bh, data):
    w, h = 8 * bw, 8 * bh
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    d = jpeg.decode(jpeg.encode_gray(w, h, pixels))
    assert (d["width"], d["height"]) == (w, h)
    diffs = [abs(a - b) for a, b in zip(pixels, d["pixels"])]
    # flat q=16: per-coefficient error <= 8; worst-case pixel error is
    # bounded well under 64 (sum of coefficient errors spread by the IDCT)
    assert max(diffs) <= 64


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 4), st.integers(1, 3), st.data())
def test_jpeg_even_constant_blocks_exact(bw, bh, data):
    w, h = 8 * bw, 8 * bh
    values = data.draw(
        st.lists(
            st.integers(0, 127).map(lambda v: 2 * v),
            min_size=bw * bh,
            max_size=bw * bh,
        )
    )
    px = bytearray(w * h)
    for by in range(bh):
        for bx in range(bw):
            v = values[by * bw + bx]
            for y in range(8):
                row0 = (by * 8 + y) * w + bx * 8
                for x in range(8):
                    px[row0 + x] = v
    d = jpeg.decode(jpeg.encode_gray(w, h, bytes(px)))
    assert d["pixels"] == bytes(px)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 3), st.integers(1, 2), st.data())
def test_jpeg_color_even_constant_blocks_exact(bw, bh, data):
    """The color extension of the even-constant-block exactness class:
    per-block constant even values in ALL THREE planes roundtrip
    bit-exactly, and the emitted RGB is exactly the fixed-point inverse
    transform of the decoded planes."""
    w, h = 8 * bw, 8 * bh
    even = st.integers(0, 127).map(lambda v: 2 * v)
    vals = data.draw(
        st.lists(
            st.tuples(even, even, even), min_size=bw * bh, max_size=bw * bh
        )
    )
    yp, cbp, crp = bytearray(w * h), bytearray(w * h), bytearray(w * h)
    for by in range(bh):
        for bx in range(bw):
            yv, cbv, crv = vals[by * bw + bx]
            for y in range(8):
                row0 = (by * 8 + y) * w + bx * 8
                for x in range(8):
                    yp[row0 + x], cbp[row0 + x], crp[row0 + x] = yv, cbv, crv
    d = jpeg.decode(jpeg.encode_ycbcr(w, h, bytes(yp), bytes(cbp), bytes(crp)))
    assert d["y"] == bytes(yp) and d["cb"] == bytes(cbp) and d["cr"] == bytes(crp)
    for i in (0, w * h - 1):
        assert tuple(d["rgb"][3 * i: 3 * i + 3]) == jpeg.ycbcr_to_rgb(
            yp[i], cbp[i], crp[i]
        )


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_jpeg_color_rgb_roundtrip_error_bound(data):
    """Arbitrary RGB through encode_color -> decode: plane error <= the
    gray bound, and the two fixed-point transforms compose to near-
    identity (each plane's quantization error scales through bounded
    integer coefficients)."""
    w = h = 8
    rgb = bytes(
        data.draw(
            st.lists(st.integers(0, 255), min_size=3 * w * h, max_size=3 * w * h)
        )
    )
    d = jpeg.decode(jpeg.encode_color(w, h, rgb))
    diffs = [abs(a - b) for a, b in zip(d["rgb"], rgb)]
    # 64 per plane through the IDCT bound; the inverse transform scales
    # chroma error by <= 1.772 and sums two terms for g
    assert max(diffs) <= 170, max(diffs)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(alphabet="ab", min_size=1, max_size=3), min_size=0, max_size=12),
    st.text(alphabet="ab", min_size=1, max_size=3),
    st.text(alphabet="ab", min_size=1, max_size=3),
)
def test_bpe_replace_equals_greedy_merge(symbols, a, b):
    got = render(symbols).replace(f"({a})({b})", f"({a}{b})")
    assert got == render(ref_merge(symbols, a, b))


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 4), st.integers(1, 3), st.integers(1, 9), st.data())
def test_jpeg_restart_stream_decodes_identically(bw, bh, interval, data):
    """For ANY image and ANY restart interval, the restarted stream must
    decode to exactly the bytes the unrestarted stream decodes to —
    restart markers change bitstream layout (byte-aligned resync,
    predictor resets), never pixels.  Intervals beyond the MCU count
    exercise the DRI-present/zero-marker case; interval 1 maximizes
    resyncs (bw*bh-1 markers, wrapping past RST7 when bw*bh > 8)."""
    w, h = 8 * bw, 8 * bh
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    base = jpeg.decode(jpeg.encode_gray(w, h, pixels))["pixels"]
    rst = jpeg.decode(
        jpeg.encode_gray(w, h, pixels, restart_interval=interval)
    )["pixels"]
    assert rst == base


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 2), st.integers(1, 2), st.integers(1, 5), st.data())
def test_jpeg_420_restart_stream_decodes_identically(mw, mh, interval, data):
    """The subsampled + restarted composition: arbitrary planes through
    4:2:0 with restarts must decode byte-identically to 4:2:0 without
    them (three DC predictors reset per boundary, interleaved-MCU
    resync)."""
    w, h = 16 * mw, 16 * mh
    n = w * h
    planes = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
        for _ in range(3)
    ]
    base = jpeg.decode(jpeg.encode_ycbcr_420(w, h, *planes))
    rst = jpeg.decode(
        jpeg.encode_ycbcr_420(w, h, *planes, restart_interval=interval)
    )
    assert (rst["y"], rst["cb"], rst["cr"]) == (base["y"], base["cb"], base["cr"])


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.integers(0, 3), st.data())
def test_jpeg_progressive_decodes_identically(bw, bh, variant, data):
    """For ANY image, a progressive stream (under several scan scripts,
    with and without restarts) must decode to exactly the bytes the
    baseline stream decodes to — the two organizations carry the same
    quantized coefficients, so any divergence is a codec bug."""
    w, h = 8 * bw, 8 * bh
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    base = jpeg.decode(jpeg.encode_gray(w, h, pixels))["pixels"]
    kwargs = [
        {},
        {"scan_script": ((0, 0, 0, 0), (1, 63, 0, 0))},
        {"scan_script": ((0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0),
                         (1, 63, 1, 0))},
        {"restart_interval": 1 + (bw * bh) % 3},
    ][variant]
    got = jpeg.decode(jpeg.encode_gray_progressive(w, h, pixels, **kwargs))
    assert got["pixels"] == base


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.sampled_from([0, 2, 6]), st.data())
def test_png_adam7_roundtrip_any_image(w, h, ct, data):
    """For ANY image and any per-pass-scanline filter assignment, an Adam7
    stream must decode to exactly the source samples — pass extraction,
    per-pass filter state, and the scatter grid are all bijective."""
    ch = {0: 1, 2: 3, 6: 4}[ct]
    n = w * h * ch
    pixels = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
    nl = png.scanline_count(w, h, 1)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=nl, max_size=nl))
    d = png.decode(
        png.encode(w, h, pixels, color_type=ct, filters=filters, interlace=1)
    )
    assert d["pixels"] == pixels
    assert (d["width"], d["height"], d["interlace"]) == (w, h, 1)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 15),
    st.integers(1, 12),
    st.sampled_from([1, 2, 4, 8]),
    st.booleans(),
    st.data(),
)
def test_png_palette_roundtrip_any_image(w, h, depth, interlaced, data):
    """Paletted streams at every depth, interlaced or not: indices survive
    MSB-first sub-byte packing and pixels come back palette-expanded."""
    n_pal = data.draw(st.integers(1, min(256, 1 << depth)))
    pal = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=3 * n_pal, max_size=3 * n_pal))
    )
    idx = bytes(
        data.draw(st.lists(st.integers(0, n_pal - 1), min_size=w * h, max_size=w * h))
    )
    il = 1 if interlaced else 0
    nl = png.scanline_count(w, h, il)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=nl, max_size=nl))
    d = png.decode(
        png.encode(
            w, h, idx, color_type=3, bit_depth=depth, palette=pal,
            filters=filters, interlace=il,
        )
    )
    assert d["indices"] == idx
    assert d["pixels"] == b"".join(pal[i * 3 : i * 3 + 3] for i in idx)
