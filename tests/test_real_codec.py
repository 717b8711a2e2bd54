"""Real-codec swap-in proof: runs only where Pillow is installed (skipped
in this container), so the decode='real' path is exercised before anyone
deploys multimodal outside the sandbox. Also pins the in-sandbox contract:
decode='real' raises a clear NotImplementedError, not an import crash."""
from __future__ import annotations

import pytest

from beymani_spark.operators import multimodal


def _media_df(spark, payloads: list[bytes]):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": range(len(payloads)),
            "kind": "image",
            "payload": payloads,
            "meta": [
                {"format": "png", "width": 16, "height": 16, "duration_ms": 0}
            ]
            * len(payloads),
        }
    )
    return spark.createDataFrame(pdf, multimodal.MEDIA_SCHEMA)


def test_real_decode_without_codec_raises_clearly(spark):
    pytest.importorskip("pyspark")
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present — covered by test_real_decode_with_pil")
    except ImportError:
        pass
    df = _media_df(spark, [b"not-an-image"])
    with pytest.raises(Exception, match="Pillow|NotImplementedError"):
        multimodal.decode_features(df, decode="real").collect()


def test_real_decode_with_pil(spark):
    """Skip-if-missing: decodes a real PNG through the full mapInPandas
    plumbing when Pillow is importable."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    import numpy as np

    payloads = []
    for val in (0, 128, 255):
        img = Image.fromarray(np.full((16, 16), val, dtype=np.uint8), mode="L")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payloads.append(buf.getvalue())
    df = _media_df(spark, payloads)

    feats = {
        r.media_id: r.features
        for r in multimodal.decode_features(df, decode="real").collect()
    }
    # constant-value images: all mass in one histogram bucket, sums to 1
    for mid, f in feats.items():
        assert abs(sum(f) - 1.0) < 1e-9
        assert max(f) == 1.0

    px = {
        r.media_id: r.pixels
        for r in multimodal.resize(df, width=4, height=4, decode="real").collect()
    }
    assert px[0] == [0] * 16
    assert px[2] == [255] * 16


def _ppm_p6(w, h, pixels_rgb) -> bytes:
    """Serialize an RGB image as binary PPM (P6) with a header comment."""
    header = f"P6\n# test image\n{w} {h}\n255\n".encode()
    return header + bytes(v for px in pixels_rgb for v in px)


def _pgm_p5(w, h, gray) -> bytes:
    header = f"P5 {w} {h} 255\n".encode()
    return header + bytes(gray)


def test_ppm_decode_runs_real_bytes_end_to_end(spark):
    """In-sandbox real-codec execution proof: binary netpbm payloads decode
    through the SAME mapInPandas batch path as decode='real', with no
    external library — header parsing, BT.601 luma, nearest resize."""
    import numpy as np

    # 4x2 RGB gradient + a 3x3 grayscale ramp
    rgb = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255),
           (0, 0, 0), (10, 20, 30), (200, 100, 50), (128, 128, 128)]
    p6 = _ppm_p6(4, 2, rgb)
    p5 = _pgm_p5(3, 3, range(0, 90, 10))
    df = _media_df(spark, [p6, p5])

    out = {r.media_id: r for r in
           multimodal.resize(df, width=2, height=2, decode="ppm").collect()}
    # luma of the P6 row-major gradient, nearest-subsampled to 2x2:
    # rows y in {0,1}, cols x in {0,3}
    luma = [(299 * r + 587 * g + 114 * b + 500) // 1000 for r, g, b in rgb]
    grid = np.array(luma).reshape(2, 4)
    assert list(out[0].pixels) == [grid[0, 0], grid[0, 3], grid[1, 0], grid[1, 3]]
    # P5: plain raster, nearest 2x2 of the 3x3 ramp = corners 0, 20, 60, 80
    assert list(out[1].pixels) == [0, 20, 60, 80]

    feats = {r.media_id: r for r in
             multimodal.decode_features(df, decode="ppm", n_features=4).collect()}
    # features = bucket histogram over the 32x32 nearest-upsampled decode;
    # every probability is over 1024 pixels and sums to 1
    for r in feats.values():
        assert abs(sum(r.features) - 1.0) < 1e-9
    # the dark P5 ramp (values 0..80) never reaches the upper half of the
    # 4-bucket histogram (bucket 2 starts at v=128)
    assert feats[1].features[2] == 0.0 and feats[1].features[3] == 0.0
    assert abs(feats[1].features[0] + feats[1].features[1] - 1.0) < 1e-9


def test_ppm_decode_rescales_low_maxval(spark):
    """netpbm samples are fractions of maxval: a maxval=15 ramp must decode
    to its true 0..255 intensities (round-half-up 255*s/15), not near-black
    raw sample values."""
    gray = [0, 5, 10, 15]
    payload = b"P5 2 2 15\n" + bytes(gray)
    px = multimodal._ppm_pixels(payload, 2, 2)
    assert px.flatten().tolist() == [(s * 255 + 7) // 15 for s in gray]  # 0,85,170,255
    # maxval=255 path is untouched (identity)
    px255 = multimodal._ppm_pixels(_pgm_p5(2, 2, [0, 5, 10, 15]), 2, 2)
    assert px255.flatten().tolist() == [0, 5, 10, 15]
    # 2-byte samples still rejected explicitly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        multimodal._ppm_pixels(b"P5 1 1 65535\n\x00\x00", 1, 1)


def test_ppm_decode_rejects_garbage_clearly(spark):
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        multimodal._ppm_pixels(b"JFIF not a netpbm", 8, 8)
    assert "netpbm" in str(ei.value)
    with _pytest.raises(Exception):
        multimodal._ppm_pixels(b"P6 4", 8, 8)  # truncated header


def _wav_pcm16(samples, n_channels=1, rate=8000) -> bytes:
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    byte_rate = rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate, byte_rate, n_channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_runs_real_audio_bytes_end_to_end(spark):
    """RIFF/WAVE PCM16 parsed in pure numpy through the same mapInPandas
    path as decode='fake' — the audio real-codec execution proof."""
    import numpy as np

    square = [1000, -1000] * 8                  # 16 samples, alternating
    ramp = list(range(-4, 4))                   # 8 samples, one sign change
    stereo = [100, 300, -100, -300, 50, 150]    # 3 frames, avg = 200,-200,100
    payloads = [
        _wav_pcm16(square),
        _wav_pcm16(ramp),
        _wav_pcm16(stereo, n_channels=2),
    ]
    df = _media_df(spark, payloads)
    out = {r.media_id: r for r in
           multimodal.audio_features(df, decode="wav").collect()}
    # square wave: rms = 1000, peak = 1000, 15 sign flips
    assert abs(out[0].rms - 1000.0) < 1e-9
    assert (out[0].peak, out[0].zero_cross) == (1000, 15)
    # ramp -4..3: one sign change; peak 4
    assert (out[1].peak, out[1].zero_cross) == (4, 1)
    exp_rms = float(np.sqrt(sum(v * v for v in ramp) / len(ramp)))
    assert abs(out[1].rms - exp_rms) < 1e-12
    # stereo downmix: exact integer channel average (200, -200, 100)
    assert out[2].peak == 200 and out[2].zero_cross == 2


def test_wav_decode_rejects_garbage_clearly(spark):
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        multimodal._wav_samples(b"ID3 not a riff file" + b"\0" * 40)
    assert "RIFF" in str(ei.value)
    with _pytest.raises(Exception):
        multimodal._wav_samples(_wav_pcm16([])[:20])  # truncated


def _avi_rgb24(frames_bgr, w, h, usec_per_frame=1_000_000, bits=24) -> bytes:
    """Serialize frames as an uncompressed RIFF-AVI: avih + vids strh/strf
    headers, bottom-up 4-byte-padded DIB rasters in 00db movi chunks."""
    import struct

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type, body):
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I", usec_per_frame, 0, 0, 0, len(frames_bgr), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"DIB " + b"\x00" * 48
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0, 0, 0, 0, 0, 0)
    stride = ((w * (bits // 8) + 3) // 4) * 4
    movi_body = b""
    for fr in frames_bgr:  # (h, w, 3) or (h, w) uint8, TOP-DOWN
        raster = b""
        for row in fr[::-1]:  # DIB stores bottom-up
            raw = row.tobytes()
            raster += raw + b"\x00" * (stride - len(raw))
        movi_body += chunk(b"00db", raster)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    import struct as _s
    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_avi_decode_runs_real_video_bytes_end_to_end(spark):
    """Uncompressed RIFF-AVI frames parsed in pure numpy through the same
    sample_frames mapInPandas path as decode='fake' — the video real-codec
    execution proof. Frame features are hash-verified against an
    independent recomputation of BT.601 luma + nearest 8x8 subsample."""
    import hashlib
    import numpy as np

    rng = np.random.RandomState(7)
    # 2-frame 10x6 24-bit clip at 1 fps native + a 1-frame 8-bit clip
    f0 = rng.randint(0, 256, size=(6, 10, 3)).astype(np.uint8)
    f1 = rng.randint(0, 256, size=(6, 10, 3)).astype(np.uint8)
    g0 = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    payloads = [
        _avi_rgb24([f0, f1], 10, 6, usec_per_frame=1_000_000),
        _avi_rgb24([g0], 8, 8, usec_per_frame=500_000, bits=8),
    ]
    df = _media_df(spark, payloads)
    out = multimodal.sample_frames(df, fps=1.0, decode="avi").collect()
    got = {(r.media_id, r.frame_idx): r for r in out}

    def expect_feat(frame_bgr):
        px = frame_bgr.astype(np.int64)
        if px.ndim == 3:
            luma = (299 * px[..., 2] + 587 * px[..., 1] + 114 * px[..., 0] + 500) // 1000
        else:
            luma = px
        ys = np.linspace(0, luma.shape[0] - 1, 8).astype(int)
        xs = np.linspace(0, luma.shape[1] - 1, 8).astype(int)
        return luma[ys][:, xs].ravel() / 255.0

    # clip 0: 2 native frames at 1 fps = 2000 ms -> samples at 0 and 1000 ms,
    # reading native frames 0 and 1 respectively
    assert {(m, k) for (m, k) in got if m == 0} == {(0, 0), (0, 1)}
    assert got[(0, 0)].offset_ms == 0 and got[(0, 1)].offset_ms == 1000
    for k, fr in [(0, f0), (1, f1)]:
        exp = expect_feat(fr)
        np.testing.assert_array_equal(np.array(got[(0, k)].frame_features), exp)
        # hash-pin the features so any luma/stride/orientation drift fails loudly
        digest = hashlib.sha256(exp.tobytes()).hexdigest()
        assert hashlib.sha256(
            np.array(got[(0, k)].frame_features).tobytes()
        ).hexdigest() == digest
    # clip 1: 1 frame at 500000 usec = 500 ms -> max(1, 0) = 1 sample
    assert {(m, k) for (m, k) in got if m == 1} == {(1, 0)}
    np.testing.assert_array_equal(
        np.array(got[(1, 0)].frame_features), expect_feat(g0)
    )


def test_avi_decode_rejects_garbage_clearly(spark):
    import numpy as np
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF/AVI"):
        multimodal._avi_frames(b"ftypmp42 not an avi" + b"\0" * 40)
    ok = _avi_rgb24([np.zeros((4, 4, 3), np.uint8)], 4, 4)
    with _pytest.raises(ValueError):
        multimodal._avi_frames(ok[:40])  # truncated header
    # compressed streams are rejected, not silently misread
    bad = bytearray(ok)
    strf_at = bytes(bad).index(b"strf")
    bad[strf_at + 8 + 16 : strf_at + 8 + 20] = b"MJPG"
    with _pytest.raises(ValueError, match="BI_RGB"):
        multimodal._avi_frames(bytes(bad))


def test_avi_decode_top_down_raster(spark):
    """Negative biHeight = top-down raster (no flip): the decoder must
    distinguish it from the default bottom-up layout — a sign error here
    silently mirrors every frame vertically."""
    import numpy as np
    import struct

    frame = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20  # distinct rows
    payload = bytearray(_avi_rgb24([frame], 4, 3, bits=8))
    # flip biHeight to negative AND store the raster top-down: with the
    # bottom-up writer helper, re-point the height field and rebuild movi
    strf_at = bytes(payload).index(b"strf")
    payload[strf_at + 8 + 8 : strf_at + 8 + 12] = struct.pack("<i", -3)
    # rebuild the frame chunk with a TOP-DOWN raster (helper wrote bottom-up)
    db_at = bytes(payload).index(b"00db")
    stride = 4  # w=4, 8-bit -> already 4-byte aligned
    raster = b"".join(bytes(r) for r in frame)  # top-down rows
    payload[db_at + 8 : db_at + 8 + stride * 3] = raster
    frames, usec = multimodal._avi_frames(bytes(payload))
    np.testing.assert_array_equal(frames[0], frame)
    # and the default bottom-up form round-trips to the same top-down frame
    frames_bu, _ = multimodal._avi_frames(_avi_rgb24([frame], 4, 3, bits=8))
    np.testing.assert_array_equal(frames_bu[0], frame)


# ------------------------------------------------------------------- PNG


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + cid
        + body
        + zlib.crc32(cid + body).to_bytes(4, "big")
    )


def test_png_round_trips_every_filter_and_color_type(spark):
    """The stdlib PNG codec (zlib inflate + numpy unfilter) must invert the
    encoder's spec residuals for ALL five scanline filters and the three
    encoder color types; color collapses to the family's integer BT.601
    luma."""
    import numpy as np

    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, size=(7, 5), dtype=np.int64)
    for filters in (0, 1, 2, 3, 4, [0, 1, 2, 3, 4, 3, 1]):
        p = multimodal.png_encode(g, color=0, filters=filters)
        np.testing.assert_array_equal(
            multimodal._png_pixels(p, 5, 7), g.astype(np.uint8)
        )
    rgb = rng.integers(0, 256, size=(6, 4, 3), dtype=np.int64)
    p = multimodal.png_encode(rgb, color=2, filters=[4, 3, 2, 1, 0, 4])
    exp = (
        (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2] + 500) // 1000
    ).astype(np.uint8)
    np.testing.assert_array_equal(multimodal._png_pixels(p, 4, 6), exp)
    rgba = rng.integers(0, 256, size=(3, 3, 4), dtype=np.int64)
    p = multimodal.png_encode(rgba, color=6, filters=4)
    exp = (
        (299 * rgba[..., 0] + 587 * rgba[..., 1] + 114 * rgba[..., 2] + 500) // 1000
    ).astype(np.uint8)
    np.testing.assert_array_equal(multimodal._png_pixels(p, 3, 3), exp)


def test_png_decode_hash_pinned_fixture(spark):
    """Hash-pinned real-codec proof: a deterministic hand-built PNG (every
    filter type across its rows, level-0 zlib) must decode to the exact
    pinned raster, and the payload itself must be byte-stable — the
    property the media_features_png oracle relies on."""
    import hashlib

    import numpy as np

    h0, w0 = 12, 16
    g = (np.arange(h0)[:, None] * 31 + np.arange(w0)[None, :] * 7) % 256
    payload = multimodal.png_encode(g, color=0, filters=[y % 5 for y in range(h0)])
    assert (
        hashlib.sha256(payload).hexdigest()
        == "20c97c23d589379d06ef6e348ba87aa04713b0c38b1578d52d2037ca7e20b60c"
    )
    dec = multimodal._png_pixels(payload, w0, h0)
    np.testing.assert_array_equal(dec, g.astype(np.uint8))
    assert (
        hashlib.sha256(dec.tobytes()).hexdigest()
        == "efe31826013aaa77c1e0f41fb3ef01a8b090f0920b953a7c2c6732fdce942aef"
    )


def test_png_decode_runs_real_bytes_end_to_end(spark):
    """decode='png' through the full mapInPandas batch path: resize reads
    the codec's native grid, decode_features histograms the 32x32 decode."""
    import numpy as np

    g = (np.arange(8)[:, None] * 32 + np.arange(8)[None, :] * 4) % 256
    payloads = [
        multimodal.png_encode(g, color=0, filters=2),
        multimodal.png_encode(np.full((4, 4), 200, dtype=np.int64), color=0),
    ]
    df = _media_df(spark, payloads)
    out = {
        r.media_id: r
        for r in multimodal.resize(df, width=2, height=2, decode="png").collect()
    }
    ys = np.linspace(0, 7, 2).astype(int)
    assert list(out[0].pixels) == list(
        g.astype(np.uint8)[ys][:, ys].ravel()
    )
    assert list(out[1].pixels) == [200] * 4
    feats = {
        r.media_id: r
        for r in multimodal.decode_features(df, decode="png", n_features=4).collect()
    }
    for r in feats.values():
        assert abs(sum(r.features) - 1.0) < 1e-9
    # the constant-200 image lands entirely in bucket 3 (192..255)
    assert feats[1].features[3] == 1.0


def test_png_decode_palette(spark):
    """Color type 3: indices look up PLTE RGB entries before the luma
    collapse."""
    import zlib

    import numpy as np

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 128, 128, 128])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    payload = (
        multimodal._PNG_SIG
        + _png_chunk(
            b"IHDR",
            (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0]),
        )
        + _png_chunk(b"PLTE", pal)
        + _png_chunk(b"IDAT", zlib.compress(raw, 0))
        + _png_chunk(b"IEND", b"")
    )
    assert multimodal._png_pixels(payload, 2, 2).flatten().tolist() == [
        76,
        150,
        29,
        128,
    ]


def test_png_decode_rejects_unsupported_clearly(spark):
    import zlib

    import numpy as np
    import pytest as _pytest

    with _pytest.raises(ValueError, match="signature"):
        multimodal._png_pixels(b"JFIF not a png", 8, 8)
    ok = multimodal.png_encode(np.zeros((2, 2), dtype=np.int64), color=0)
    # 16-bit depth
    bad = bytearray(ok)
    bad[8 + 8 + 8] = 16
    with _pytest.raises(ValueError, match="bit depth"):
        multimodal._png_pixels(bytes(bad), 2, 2)
    # Adam7 interlace
    bad = bytearray(ok)
    bad[8 + 8 + 12] = 1
    with _pytest.raises(ValueError, match="interlaced"):
        multimodal._png_pixels(bytes(bad), 2, 2)
    # unknown scanline filter inside the raster
    raw = b"\x09\x00\x00"
    payload = (
        multimodal._PNG_SIG
        + _png_chunk(
            b"IHDR",
            (2).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0]),
        )
        + _png_chunk(b"IDAT", zlib.compress(raw, 0))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="filter"):
        multimodal._png_pixels(payload, 2, 1)
    # missing IDAT
    payload = multimodal._PNG_SIG + _png_chunk(
        b"IHDR",
        (2).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0]),
    )
    with _pytest.raises(ValueError, match="truncated"):
        multimodal._png_pixels(payload, 2, 1)


# ------------------------------------------------------------------ JPEG


def test_jpg_round_trips_exactly_at_unit_quantization(spark):
    """With Q=1 the only loss is DCT/IDCT float rounding: the gradient
    fixture must round-trip EXACTLY and random noise within 1 LSB —
    proving the huffman entropy coder (DPCM DC, RLE AC, ZRL/EOB, byte
    stuffing) inverts bit-perfectly."""
    import numpy as np

    ones = np.ones((8, 8), dtype=np.int64)
    g = ((np.arange(24)[:, None] * 5 + np.arange(16)[None, :] * 3) % 256).astype(
        np.int64
    )
    dec = multimodal._jpg_pixels(multimodal.jpg_encode(g, qtable=ones), 16, 24)
    np.testing.assert_array_equal(dec, g.astype(np.uint8))
    rng = np.random.default_rng(5)
    r = rng.integers(0, 256, size=(16, 16), dtype=np.int64)
    dec = multimodal._jpg_pixels(multimodal.jpg_encode(r, qtable=ones), 16, 16)
    assert int(np.abs(dec.astype(int) - r).max()) <= 1
    # non-multiple-of-8 dims: edge padding encoded, cropped on decode
    odd = rng.integers(0, 256, size=(11, 13), dtype=np.int64)
    dec = multimodal._jpg_pixels(multimodal.jpg_encode(odd, qtable=ones), 13, 11)
    assert dec.shape == (11, 13)
    assert int(np.abs(dec.astype(int) - odd).max()) <= 1


def test_jpg_hash_pinned_fixture(spark):
    """Byte-stable encoder + pinned decode of the standard-table stream."""
    import hashlib

    import numpy as np

    g = ((np.arange(24)[:, None] * 5 + np.arange(16)[None, :] * 3) % 256).astype(
        np.int64
    )
    p1 = multimodal.jpg_encode(g, qtable=np.ones((8, 8), dtype=np.int64))
    assert (
        hashlib.sha256(p1).hexdigest()
        == "c8d3fbd4afa35b3e0f97ec01ddd1582fdcabdd52232359e8cb6b95e1ba1ddd5a"
    )
    dec = multimodal._jpg_pixels(multimodal.jpg_encode(g), 16, 24)
    assert (
        hashlib.sha256(dec.tobytes()).hexdigest()
        == "c27dcb5484c695bf27add9d31f9afea8ed13c981479a9a19e697ac89e5cf2720"
    )
    # lossy but close on smooth data with the Annex K table
    assert int(np.abs(dec.astype(int) - g).max()) <= 3


def test_jpg_decode_runs_real_bytes_end_to_end(spark):
    """decode='jpg' through the full mapInPandas batch path."""
    import numpy as np

    ones = np.ones((8, 8), dtype=np.int64)
    payloads = [
        multimodal.jpg_encode(
            ((np.arange(8)[:, None] * 32 + np.arange(8)[None, :] * 4) % 256).astype(
                np.int64
            ),
            qtable=ones,
        ),
        multimodal.jpg_encode(np.full((8, 8), 200, dtype=np.int64), qtable=ones),
    ]
    df = _media_df(spark, payloads)
    feats = {
        r.media_id: r
        for r in multimodal.decode_features(df, decode="jpg", n_features=4).collect()
    }
    for r in feats.values():
        assert abs(sum(r.features) - 1.0) < 1e-9
    assert feats[1].features[3] == 1.0  # constant 200 -> bucket 3
    out = {
        r.media_id: r
        for r in multimodal.resize(df, width=2, height=2, decode="jpg").collect()
    }
    assert list(out[1].pixels) == [200] * 4


def test_jpg_decode_rejects_unsupported_clearly(spark):
    import numpy as np
    import pytest as _pytest

    with _pytest.raises(ValueError, match="SOI"):
        multimodal._jpg_pixels(b"not a jpeg", 8, 8)
    ok = bytearray(multimodal.jpg_encode(np.zeros((8, 8), dtype=np.int64)))
    # flip SOF0 -> SOF2 (progressive)
    sof_at = bytes(ok).index(b"\xff\xc0")
    bad = bytearray(ok)
    bad[sof_at + 1] = 0xC2
    with _pytest.raises(ValueError, match="baseline"):
        multimodal._jpg_pixels(bytes(bad), 8, 8)
    # claim 2x2 subsampling
    bad = bytearray(ok)
    bad[sof_at + 4 + 7] = 0x22  # sampling byte of component 1
    with _pytest.raises(ValueError, match="subsampling"):
        multimodal._jpg_pixels(bytes(bad), 8, 8)
    # truncated: no SOS
    with _pytest.raises(ValueError, match="truncated|SOS"):
        multimodal._jpg_pixels(bytes(ok[:sof_at]) + b"\xff\xd9", 8, 8)


def test_jpg_header_walk_skips_fill_bytes_and_standalone_markers(spark):
    """Spec-legal padding between segments — 0xFF fill bytes, TEM (0x01),
    RSTn (0xD0-0xD7) — carries no length word; externally produced
    baseline streams using them must decode identically, not misparse the
    next two bytes as a segment length."""
    import numpy as np

    g = ((np.arange(16)[:, None] * 7 + np.arange(16)[None, :] * 3) % 256).astype(
        np.int64
    )
    ones = np.ones((8, 8), dtype=np.int64)
    clean = multimodal.jpg_encode(g, qtable=ones)
    # inject after SOI: fill byte run, a TEM, and a standalone RST0
    padded = clean[:2] + b"\xff\xff" + b"\xff\x01" + b"\xff\xd0" + clean[2:]
    np.testing.assert_array_equal(
        multimodal._jpg_pixels(padded, 16, 16),
        multimodal._jpg_pixels(clean, 16, 16),
    )


def test_png_encode_rejects_palette_color_type(spark):
    """color=3 would need a PLTE chunk the encoder never writes — must be
    rejected up front, not emitted as a spec-invalid file."""
    import numpy as np
    import pytest as _pytest

    with _pytest.raises(ValueError, match="color types 0/2/6"):
        multimodal.png_encode(np.zeros((4, 4), dtype=np.int64), color=3)


def test_jpg_truncated_fill_run_raises_valueerror():
    """A stream ending in an 0xFF fill run must fail the decoder's
    ValueError contract, not an IndexError from the fill-byte skip."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated"):
        multimodal._jpg_pixels(b"\xff\xd8\xff\xff", 8, 8)


def test_phash_properties(spark):
    """pHash: exact copies hash identically (recall 1.0 on true dups);
    a pure brightness shift moves ONLY the DC coefficient, so hamming
    <= 1; unrelated rasters land far apart; banding finds every
    hamming<=3 pair (pigeonhole); max_hamming > 3 rejected."""
    import numpy as np
    import pytest

    from beymani_spark.operators.multimodal import (
        _fake_pixels,
        phash_dup_pairs,
        phash_hex,
        phash64,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 200, size=(32, 32))
    bright = np.clip(base + 20, 0, 255)
    other = rng.randint(0, 256, size=(32, 32))
    h_base, h_bright, h_other = phash_hex(
        np.stack([base, bright, other]).astype(np.uint8)
    )

    def hamming(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert hamming(h_base, h_bright) <= 1, "brightness shift flips at most DC"
    assert hamming(h_base, h_other) > 10, "unrelated rasters must differ widely"

    # Spark pipeline: planted exact copy must surface at hamming 0
    rows = [(1, b"alpha payload"), (2, b"alpha payload"), (3, b"something else")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = phash64(df, decode="fake")
    got = {(r["src"], r["dst"]): r["hamming"] for r in phash_dup_pairs(hashed).collect()}
    assert got == {(1, 2): 0}
    # determinism vs the local kernel replay
    hx = {r["media_id"]: r["phash"] for r in hashed.collect()}
    local = phash_hex(_fake_pixels(b"alpha payload", 32, 32)[None, ...])[0]
    assert hx[1] == local

    # pigeonhole: 3 flipped bits spread over 3 bands still collide on band 4
    h1 = "0000" * 4
    h2 = "0001" + "0002" + "0004" + "0000"
    df2 = spark.createDataFrame(
        [(1, h1), (2, h2)], "media_id long, phash string"
    )
    pairs = phash_dup_pairs(df2, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 3

    with pytest.raises(ValueError, match="hamming"):
        phash_dup_pairs(df2, max_hamming=4)


def test_phash_composite_banding_subset_and_pigeonhole(spark):
    """Composite 2-of-4 banding: results equal the single-band form
    restricted to hamming <= 2 (candidate edges are a subset, recall
    guaranteed by the intact band pair); a 2-bit flip across two
    different bands still collides; max_hamming=3 rejected in composite
    mode."""
    import pytest

    from beymani_spark.operators.multimodal import phash64, phash_dup_pairs

    rows = [(i, f"payload number {i % 5}".encode()) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = phash64(df, decode="fake")
    base = {
        (r["src"], r["dst"]): r["hamming"]
        for r in phash_dup_pairs(
            hashed, max_hamming=2, composite_bands=False
        ).collect()
    }
    comp = {
        (r["src"], r["dst"]): r["hamming"]
        for r in phash_dup_pairs(
            hashed, max_hamming=2, composite_bands=True
        ).collect()
    }
    assert comp == base, "composite banding must not lose hamming<=2 pairs"
    assert base, "fixture must produce at least one duplicate pair"

    # 2 flips in 2 DIFFERENT bands: bands 3+4 remain an intact pair
    h1, h2 = "0000" * 4, "0001" + "0002" + "0000" + "0000"
    df2 = spark.createDataFrame([(1, h1), (2, h2)], "media_id long, phash string")
    pairs = phash_dup_pairs(df2, max_hamming=2, composite_bands=True).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 2

    with pytest.raises(ValueError, match="hamming"):
        phash_dup_pairs(df2, max_hamming=3, composite_bands=True)


def test_audio_fingerprint_properties(spark):
    """Audio fingerprint: gain-invariant (scaling every sample leaves
    every energy comparison unchanged), exact copies pair at hamming 0
    through the shared band engine, unrelated clips land far apart, and
    the WAV decode path fingerprints real RIFF bytes."""
    import numpy as np

    from beymani_spark.operators.multimodal import (
        audio_fingerprint,
        audio_fingerprint_hex,
        phash_dup_pairs,
    )

    t = np.linspace(0, 80, 2048)
    tone = (np.sin(t * 3) + 0.4 * np.sin(t * 11)) * 4000
    noise = np.random.RandomState(9).randn(2048) * 900
    h_tone, h_gain, h_noise = audio_fingerprint_hex([tone, tone * 3.5, noise])
    assert h_tone == h_gain, "gain scaling must not flip any bit"
    assert bin(int(h_tone, 16) ^ int(h_noise, 16)).count("1") > 10

    rows = [(1, b"same clip text"), (2, b"same clip text"), (3, b"another clip")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = audio_fingerprint(df, decode="fake")
    got = {
        (r["src"], r["dst"]): r["hamming"]
        for r in phash_dup_pairs(hashed, hash_col="afp").collect()
    }
    assert got == {(1, 2): 0}

    # real RIFF/WAVE path: identical PCM -> identical fingerprint
    from beymani_spark.operators.multimodal import _wav_samples

    import struct

    pcm = (np.sin(np.linspace(0, 50, 600)) * 12000).astype(np.int16)
    data = pcm.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert (_wav_samples(wav) == pcm).all()
    wdf = spark.createDataFrame(
        [(1, wav), (2, wav)], "media_id long, payload binary"
    )
    whashed = audio_fingerprint(wdf, decode="wav")
    wpairs = phash_dup_pairs(whashed, hash_col="afp").collect()
    assert len(wpairs) == 1 and wpairs[0]["hamming"] == 0


def test_video_phash_semantics(spark):
    """Video pHash: exact copies pair at max_frame_hamming 0; ONE shared
    scene does not make a duplicate (candidates collide, the all-frames
    verify rejects); equal band values at DIFFERENT (frame, band)
    positions never become candidates; the real-AVI path hashes identical
    containers identically."""
    import numpy as np

    from beymani_spark.operators.multimodal import (
        video_phash,
        video_phash_dup_pairs,
    )

    rows = [(1, b"clip alpha"), (2, b"clip alpha"), (3, b"clip beta")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = video_phash(df, n_frames=4, decode="fake")
    got = {
        (r["src"], r["dst"]): r["max_frame_hamming"]
        for r in video_phash_dup_pairs(hashed).collect()
    }
    assert got == {(1, 2): 0}

    # crafted signatures: share frame 0 entirely, differ wildly elsewhere
    shared = "00ff11aa22bb33cc"
    v1 = shared + "0000000000000000" * 3
    v2 = shared + "ffffffffffffffff" * 3
    crafted = spark.createDataFrame(
        [(1, v1), (2, v2)], "media_id long, vhash string"
    )
    assert video_phash_dup_pairs(crafted).count() == 0, (
        "one shared scene must not be a duplicate"
    )
    # same 4-char sig at a DIFFERENT position, every OTHER position
    # pairwise distinct: positional banding must produce NO candidate at
    # all (sig-only joining would collide on 'abcd'), so the zero count
    # exercises the candidate stage, not the verify
    v3 = "abcd" + "".join(f"{0x1000 + i:04x}" for i in range(15))
    v4 = "9999abcd" + "".join(f"{0x2000 + i:04x}" for i in range(14))
    shifted = spark.createDataFrame(
        [(1, v3), (2, v4)], "media_id long, vhash string"
    )
    assert video_phash_dup_pairs(shifted).count() == 0

    # length contract: a signature hashed with a different frame count is
    # excluded, never banded wrongly
    mixed = spark.createDataFrame(
        [(1, "0" * 64), (2, "0" * 64), (3, "0" * 32)],
        "media_id long, vhash string",
    )
    pairs = video_phash_dup_pairs(mixed).collect()
    assert {(r["src"], r["dst"]) for r in pairs} == {(1, 2)}

    # real RIFF-AVI: identical containers hash identically through the
    # genuine frame walk (reuse the suite's RGB24 AVI fixture builder)
    w, h, nf = 16, 8, 5
    frames = [
        np.repeat(
            ((np.arange(w * h, dtype=np.uint16).reshape(h, w) + 17 * k) % 256)
            .astype(np.uint8)[:, :, None],
            3,
            axis=2,
        )
        for k in range(nf)
    ]
    payload = _avi_rgb24(frames, w, h, usec_per_frame=40000)
    adf = spark.createDataFrame(
        [(1, payload), (2, payload)], "media_id long, payload binary"
    )
    ah = video_phash(adf, n_frames=3, decode="avi")
    pairs = video_phash_dup_pairs(ah, n_frames=3).collect()
    assert len(pairs) == 1 and pairs[0]["max_frame_hamming"] == 0


def test_phash_dup_pairs_length_contract(spark):
    """The image/audio pair engine enforces the 16-hex length contract
    row-locally (the video form's guard): malformed hashes — '' or a
    64-char vhash passed by mistake — are excluded BEFORE banding, so
    they can neither share ('', band) buckets with every other malformed
    row nor be silently dropped post-join as NULL hammings."""
    from beymani_spark.operators.multimodal import phash_dup_pairs

    rows = [
        (1, "00ff11aa22bb33cc"),
        (2, "00ff11aa22bb33cc"),
        (3, ""),                      # empty: every substring is ''
        (4, ""),                      # second empty — would all-pairs with 3
        (5, "0" * 64),                # vhash-length mistake
        (6, "0" * 64),
        (7, "abcd"),                  # truncated
    ]
    df = spark.createDataFrame(rows, "media_id long, phash string")
    pairs = phash_dup_pairs(df, max_hamming=3).collect()
    assert {(r["src"], r["dst"]) for r in pairs} == {(1, 2)}
    # composite mode rides the same guard
    pairs = phash_dup_pairs(df, max_hamming=2, composite_bands=True).collect()
    assert {(r["src"], r["dst"]) for r in pairs} == {(1, 2)}


def test_audio_composite_banding_subset_and_pigeonhole(spark):
    """Audio fingerprints ride the shared band engine, so composite
    2-of-4 banding must behave identically: results equal the single-band
    form restricted to hamming <= 2; a 2-bit flip across two DIFFERENT
    bands still collides on the intact pair; max_hamming=3 rejected."""
    import pytest

    from beymani_spark.operators.multimodal import (
        audio_fingerprint,
        phash_dup_pairs,
    )

    rows = [(i, f"clip number {i % 5}".encode()) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = audio_fingerprint(df, decode="fake", n_samples=1024)
    base = {
        (r["src"], r["dst"]): r["hamming"]
        for r in phash_dup_pairs(
            hashed, hash_col="afp", max_hamming=2, composite_bands=False
        ).collect()
    }
    comp = {
        (r["src"], r["dst"]): r["hamming"]
        for r in phash_dup_pairs(
            hashed, hash_col="afp", max_hamming=2, composite_bands=True
        ).collect()
    }
    assert comp == base, "composite banding must not lose hamming<=2 pairs"
    assert base, "fixture must produce at least one duplicate pair"

    h1, h2 = "0000" * 4, "0001" + "0002" + "0000" + "0000"
    df2 = spark.createDataFrame([(1, h1), (2, h2)], "media_id long, afp string")
    pairs = phash_dup_pairs(
        df2, hash_col="afp", max_hamming=2, composite_bands=True
    ).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 2

    with pytest.raises(ValueError, match="hamming"):
        phash_dup_pairs(df2, hash_col="afp", max_hamming=3, composite_bands=True)


def test_video_composite_banding_subset_and_pigeonhole(spark):
    """Video composite banding: results equal the single-band form
    restricted to max_frame_hamming <= 2 on hashed fixtures; per-frame
    pigeonhole — 2 flips in 2 DIFFERENT bands of EVERY frame still
    collides on each frame's intact pair; composite signatures are
    positional, so an equal band PAIR at a different frame is no
    candidate; max_hamming=3 rejected in composite mode."""
    import pytest

    from beymani_spark.operators.multimodal import (
        video_phash,
        video_phash_dup_pairs,
    )

    rows = [(i, f"clip number {i % 5}".encode()) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = video_phash(df, n_frames=4, decode="fake")
    base = {
        (r["src"], r["dst"]): r["max_frame_hamming"]
        for r in video_phash_dup_pairs(
            hashed, n_frames=4, max_hamming=2, composite_bands=False
        ).collect()
    }
    comp = {
        (r["src"], r["dst"]): r["max_frame_hamming"]
        for r in video_phash_dup_pairs(
            hashed, n_frames=4, max_hamming=2, composite_bands=True
        ).collect()
    }
    assert comp == base, "composite banding must not lose hamming<=2 pairs"
    assert base, "fixture must produce at least one duplicate pair"

    # 2 flips spread over bands 0+1 of EVERY frame: bands 2+3 remain an
    # intact pair within each frame
    v1 = "0000" * 16
    v2 = ("0001" + "0002" + "0000" + "0000") * 4
    crafted = spark.createDataFrame(
        [(1, v1), (2, v2)], "media_id long, vhash string"
    )
    pairs = video_phash_dup_pairs(
        crafted, n_frames=4, max_hamming=2, composite_bands=True
    ).collect()
    assert len(pairs) == 1 and pairs[0]["max_frame_hamming"] == 2

    # same band PAIR value at a DIFFERENT frame, all else pairwise
    # distinct: positional composite banding must produce NO candidate
    f_pair = "abcd1234"
    v3 = f_pair + "".join(f"{0x1000 + i:04x}" for i in range(14))
    v4 = "".join(f"{0x2000 + i:04x}" for i in range(4)) + f_pair + "".join(
        f"{0x3000 + i:04x}" for i in range(10)
    )
    shifted = spark.createDataFrame(
        [(1, v3), (2, v4)], "media_id long, vhash string"
    )
    assert (
        video_phash_dup_pairs(
            shifted, n_frames=4, max_hamming=2, composite_bands=True
        ).count()
        == 0
    )

    with pytest.raises(ValueError, match="hamming"):
        video_phash_dup_pairs(crafted, max_hamming=3, composite_bands=True)


def test_phash_auto_banding_default_is_composite(spark):
    """The bare call is the scale-safe form: composite_bands='auto'
    resolves to composite 2-of-4 at the default radius (2), matching an
    explicit composite call pair-for-pair, and falls back to single
    bands only for an explicit radius-3 call — which must still find a
    3-bit-flip pair composite banding cannot guarantee."""
    from beymani_spark.operators.multimodal import (
        phash64,
        phash_dup_pairs,
        video_phash,
        video_phash_dup_pairs,
    )

    rows = [(i, f"payload number {i % 5}".encode()) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashed = phash64(df, decode="fake")
    bare = {
        (r["src"], r["dst"]): r["hamming"]
        for r in phash_dup_pairs(hashed).collect()
    }
    comp = {
        (r["src"], r["dst"]): r["hamming"]
        for r in phash_dup_pairs(
            hashed, max_hamming=2, composite_bands=True
        ).collect()
    }
    assert bare == comp and bare, "bare call must BE the composite form"

    # 3 flips inside one band: only single-band recall covers radius 3,
    # and the explicit radius-3 call must auto-select it
    h1, h2 = "0000" * 4, "0007" + "0000" * 3
    df2 = spark.createDataFrame(
        [(1, h1), (2, h2)], "media_id long, phash string"
    )
    wide = phash_dup_pairs(df2, max_hamming=3).collect()
    assert len(wide) == 1 and wide[0]["hamming"] == 3
    assert not phash_dup_pairs(df2).collect(), (
        "default radius is 2 — the 3-bit pair is outside it"
    )

    vhashed = video_phash(df, n_frames=4, decode="fake")
    vbare = {
        (r["src"], r["dst"]): r["max_frame_hamming"]
        for r in video_phash_dup_pairs(vhashed, n_frames=4).collect()
    }
    vcomp = {
        (r["src"], r["dst"]): r["max_frame_hamming"]
        for r in video_phash_dup_pairs(
            vhashed, n_frames=4, max_hamming=2, composite_bands=True
        ).collect()
    }
    assert vbare == vcomp and vbare, "video bare call must BE composite"
