"""Real image codecs (BMP struct+numpy, PNG stdlib zlib) and their
integration with the multimodal Arrow operators: decode → stats / resize →
re-encode round-trips on genuine image bytes, violation rows on corrupt
payloads — the round-4 verdict's 'one real image codec' criterion."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_profiler_spark.operators import imagecodec as ic
from data_profiler_spark.operators import multimodal


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


# ------------------------------------------------------------------ BMP --


def test_bmp_roundtrip_exact_24bpp():
    px = _img(5, 3, 3)  # width 3 → 9-byte rows pad to 12 (exercises padding)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)


def test_bmp_roundtrip_exact_32bpp():
    px = _img(4, 7, 4)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)


def test_bmp_golden_bytes_bottom_up_bgr():
    """Pin the on-disk layout against hand-assembled bytes: 2x2 24-bpp,
    bottom-up rows, BGR order, rows padded to 4 bytes."""
    # image: [[red, green], [blue, white]]
    red, green, blue, white = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)
    # stored bottom-up → file rows: (blue, white) then (red, green), BGR
    row_bottom = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    pixels = row_bottom + row_top
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    got = ic.decode_bmp(header + dib + pixels)
    want = np.array([[red, green], [blue, white]], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_bmp_top_down_negative_height():
    px = _img(3, 2, 3)
    b = bytearray(ic.encode_bmp(px))
    # flip to top-down: negate height, reorder rows accordingly
    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    got = ic.decode_bmp(bytes(b))
    assert np.array_equal(got, px[::-1])


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b[:40], "shorter"),
        (lambda b: b"XX" + b[2:], "magic"),
        (lambda b: b[:-8], "truncated"),
    ],
)
def test_bmp_corrupt_raises_value_error(mutate, msg):
    good = ic.encode_bmp(_img(4, 4, 3))
    with pytest.raises(ValueError, match=msg):
        ic.decode_bmp(mutate(good))


# ------------------------------------------------------------------ PNG --


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip_exact_all_color_types(c):
    px = _img(6, 5, c, seed=c)
    got = ic.decode_png(ic.encode_png(px))
    assert np.array_equal(got, px)


def _filter_rows(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Forward-apply PNG filters (the encoder's side of the contract the
    decoder must invert) — an independent implementation for the test."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        cur = flat[y]
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            left = cur[i - c] if i >= c else 0
            ul = prev[i - c] if i >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = prev[i]
            elif f == 3:
                pred = (left + prev[i]) >> 1
            else:
                pred = ic._paeth(int(left), int(prev[i]), int(ul))
            enc[i] = (cur[i] - pred) & 0xFF
        out.append(f)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def test_png_decode_all_five_filters():
    """Hand-filter an image cycling through filters 0..4 and assemble the
    PNG by hand — decode must invert every filter exactly."""
    px = _img(10, 4, 3, seed=9)
    raw = _filter_rows(px, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 4, 10, 8, 2, 0, 0, 0)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    payload = (
        ic._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(ic.decode_png(payload), px)


def test_png_multiple_idat_chunks_concatenate():
    px = _img(3, 3, 3, seed=2)
    good = ic.encode_png(px)
    # split the single IDAT into two: re-chunk by hand
    sig = ic._PNG_SIG
    pos = len(sig)
    chunks = []
    while pos < len(good):
        (length,) = struct.unpack_from(">I", good, pos)
        chunks.append((good[pos + 4 : pos + 8], good[pos + 8 : pos + 8 + length]))
        pos += 12 + length
    idat = next(b for t, b in chunks if t == b"IDAT")

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    split = (
        sig
        + chunk(b"IHDR", dict(chunks)[b"IHDR"])
        + chunk(b"IDAT", idat[:5])
        + chunk(b"IDAT", idat[5:])
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(ic.decode_png(split), px)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"\x89PNX" + b[4:], "signature"),
        (lambda b: b[: len(b) // 2], "truncated|missing|IDAT"),
        # corrupt one IDAT byte → CRC mismatch
        (lambda b: b[:45] + bytes([b[45] ^ 0xFF]) + b[46:], "CRC|inflate|filter"),
    ],
)
def test_png_corrupt_raises_value_error(mutate, msg):
    good = ic.encode_png(_img(4, 4, 3))
    with pytest.raises(ValueError, match=msg):
        ic.decode_png(mutate(good))


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 10_000),
)
def test_codec_roundtrips_property(h, w, c, seed):
    px = _img(h, w, c, seed)
    assert np.array_equal(ic.decode_png(ic.encode_png(px)), px)
    if c in (3, 4):
        assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)


# ------------------------------------------- Spark-side integration ------


def _media_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["media_id", "payload", "fmt", "width", "height"])
    return spark.createDataFrame(
        pdf, "media_id string, payload binary, fmt string, width int, height int"
    )


def test_media_decode_stats_on_real_images(spark):
    bmp_px = _img(8, 6, 3, seed=1)
    png_px = _img(5, 9, 4, seed=2)
    df = _media_df(
        spark,
        [
            ("b1", bytearray(ic.encode_bmp(bmp_px)), "bmp", 6, 8),
            ("p1", bytearray(ic.encode_png(png_px)), "png", 9, 5),
            ("bad", bytearray(b"BMnot really a bitmap"), "bmp", 1, 1),
            ("mystery", bytearray(b"\x00" * 32), "tiff", 1, 1),
        ],
    )
    got = {
        r["media_id"]: r
        for r in multimodal.media_decode_stats(df, passthrough=["width", "height"]).collect()
    }
    assert got["b1"]["decode_ok"] and got["p1"]["decode_ok"]
    assert (got["b1"]["dec_height"], got["b1"]["dec_width"], got["b1"]["channels"]) == (8, 6, 3)
    assert (got["p1"]["dec_height"], got["p1"]["dec_width"], got["p1"]["channels"]) == (5, 9, 4)
    assert got["b1"]["mean_intensity"] == pytest.approx(float(bmp_px.mean()), abs=1e-9)
    assert got["p1"]["std_intensity"] == pytest.approx(float(png_px.std()), abs=1e-9)
    # corrupt bmp → violation row, not a job failure
    assert not got["bad"]["decode_ok"] and "bmp" in got["bad"]["decode_err"]
    # unregistered format → the honest NotImplementedError, as a row
    assert not got["mystery"]["decode_ok"]
    assert "no decoder registered" in got["mystery"]["decode_err"]


def test_resize_media_real_codec_roundtrip(spark):
    px = _img(16, 12, 3, seed=3)
    df = _media_df(spark, [("m", bytearray(ic.encode_png(px)), "png", 12, 16)])
    out = multimodal.resize_media(df, target_h=4, target_w=6).collect()[0]
    assert out["resize_err"] is None
    assert (out["out_height"], out["out_width"]) == (4, 6)
    # re-encoded payload decodes to exactly the nn_resize of the original
    got = ic.decode_png(bytes(out["resized"]))
    assert np.array_equal(got, multimodal.nn_resize(px, 4, 6))


def test_check_dims_consistency_flags_real_image(spark):
    px = _img(4, 4, 3)
    df = _media_df(
        spark,
        [
            ("ok", bytearray(ic.encode_bmp(px)), "bmp", 4, 4),
            ("lied", bytearray(ic.encode_bmp(px)), "bmp", 64, 64),
        ],
    )
    stats = multimodal.media_decode_stats(df, passthrough=["width", "height"])
    viol = multimodal.check_dims_consistency(stats).collect()
    assert [v["clip_id"] for v in viol] == ["lied"]
    assert "declared 64x64 decoded 4x4" in viol[0]["detail"]


def test_png_truncated_inside_crc_raises_value_error():
    """r5 review finding: a cut INSIDE a chunk's 4-byte CRC field passed the
    body-length check and hit struct.error instead of the module's
    documented ValueError envelope."""
    good = ic.encode_png(_img(4, 4, 3))
    # layout: sig(8) + IHDR(12+13) + IDAT(12+L) + IEND(12)
    (idat_len,) = struct.unpack_from(">I", good, 8 + 25)
    cut = good[: 8 + 25 + 8 + idat_len + 2]  # 2 bytes into IDAT's CRC
    with pytest.raises(ValueError, match="truncated"):
        ic.decode_png(cut)


def test_png_ihdr_wrong_length_raises_value_error():
    """An IHDR whose declared length is not 13 must be a ValueError, not a
    struct.error from the fixed-size unpack."""
    sig = b"\x89PNG\r\n\x1a\n"
    body = struct.pack(">IIBBBB", 4, 4, 8, 2, 0, 0)  # 12 bytes, one short

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    with pytest.raises(ValueError, match="IHDR length"):
        ic.decode_png(sig + chunk(b"IHDR", body) + chunk(b"IEND", b""))


def test_png_truncation_removing_iend_raises_value_error():
    """r5 second-pass finding: a cut inside the FINAL chunk's 8-byte
    length+type header exits the chunk walk silently with complete-looking
    IHDR+IDAT — truncation must never decode."""
    good = ic.encode_png(_img(4, 4, 3))
    with pytest.raises(ValueError, match="IEND"):
        ic.decode_png(good[:-5])  # 5 bytes into IEND's 12-byte chunk
