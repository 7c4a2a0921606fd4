"""Real media decode: pure-Python PPM(P6)/BMP(24bpp) parsing through
the Arrow-batched mapInPandas pipeline, pinned against numpy-built
fixtures (no codec library in this container — these two uncompressed
formats need none)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_engineering_user_session_analysis_spark.operators.multimodal import (
    _decode_bmp,
    _decode_ppm,
    decode_image,
    extract_image_features,
)


def _gradient(h: int, w: int) -> np.ndarray:
    """Deterministic RGB test image."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)


def _encode_ppm(img: np.ndarray, comment: bool = False) -> bytes:
    h, w = img.shape[:2]
    header = b"P6\n"
    if comment:
        header += b"# fixture comment line\n"
    header += f"{w} {h}\n255\n".encode()
    return header + img.tobytes()


def _encode_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal 24bpp uncompressed BMP writer (BGR, padded rows)."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        rows.append(img[y, :, ::-1].tobytes() + pad)  # RGB -> BGR
    raster = b"".join(rows)
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(raster)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        24,
        0,
        len(raster),
        2835,
        2835,
        0,
        0,
    )
    return file_header + info_header + raster


@pytest.mark.parametrize("comment", [False, True])
def test_ppm_roundtrip(comment):
    img = _gradient(13, 17)
    got = _decode_ppm(_encode_ppm(img, comment=comment))
    assert np.array_equal(got, img)


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(top_down):
    # width 17 exercises row padding (17*3 = 51 -> padded to 52)
    img = _gradient(9, 17)
    got = _decode_bmp(_encode_bmp(img, top_down=top_down))
    assert np.array_equal(got, img)


def test_decode_image_dispatches_by_magic():
    img = _gradient(4, 6)
    assert np.array_equal(decode_image(_encode_ppm(img)), img)
    assert np.array_equal(decode_image(_encode_bmp(img)), img)
    with pytest.raises((NotImplementedError, ValueError)):
        decode_image(b"\x89PNG\r\n\x1a\nnot really a png")


def test_bmp_unsupported_variants_rejected():
    img = _gradient(4, 4)
    data = bytearray(_encode_bmp(img))
    struct.pack_into("<HH", data, 26, 1, 8)  # 8bpp
    with pytest.raises(NotImplementedError):
        _decode_bmp(bytes(data))


def test_extract_image_features_end_to_end(spark):
    """The real decode path through the SAME mapInPandas pipeline
    shape as the registered fake-feature query: dims and exact
    channel means must match the numpy reference."""
    imgs = {1: _gradient(8, 5), 2: _gradient(3, 12), 3: _gradient(16, 16)}
    rows = [
        (1, bytearray(_encode_ppm(imgs[1]))),
        (2, bytearray(_encode_bmp(imgs[2]))),
        (3, bytearray(_encode_bmp(imgs[3], top_down=True))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r.asDict() for r in extract_image_features(df).collect()
    }
    assert set(got) == set(imgs)
    for doc_id, img in imgs.items():
        r = got[doc_id]
        h, w = img.shape[:2]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, h * w)
        sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        assert r["mean_r"] == sums[0] / (h * w)
        assert r["mean_g"] == sums[1] / (h * w)
        assert r["mean_b"] == sums[2] / (h * w)
