"""Baseline JPEG codec (functions/jpeg.py): spec identities, lossy
roundtrip bounds, subsampling, and clear refusal of unsupported modes.

JPEG is lossy, so "roundtrip" is bounded-error, with one exact anchor:
a flat-color image is DC-only energy, which survives quantization
exactly at every quality — decode must reproduce it to the rounding
error of the color transform (<= 1)."""

from __future__ import annotations

import numpy as np
import pytest

from dawnsearch_spark.functions.jpeg import (
    DCT_T,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def test_dct_matrix_orthonormal():
    assert np.allclose(DCT_T @ DCT_T.T, np.eye(8), atol=1e-12)


def test_zigzag_is_spec_order():
    # first 10 entries of the T.81 zigzag scan, as (row*8 + col)
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("shape", [(16, 24), (13, 19), (8, 8), (33, 41)])
def test_flat_color_near_exact(shape, subsampling):
    img = np.full((*shape, 3), [120, 64, 200], np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=subsampling))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_gradient_psnr(subsampling):
    h, w = 40, 56
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=subsampling))
    mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr >= (40 if subsampling == "444" else 33), psnr


def test_noise_bounded_error_q95():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() < 48


def test_decode_rejects_progressive_and_garbage():
    img = np.full((8, 8, 3), 128, np.uint8)
    payload = bytearray(encode_jpeg(img))
    # flip SOF0 (0xFFC0) to SOF2 (progressive)
    i = bytes(payload).find(b"\xff\xc0")
    assert i > 0
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_quality_monotone_size():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_420_smaller_than_444():
    h, w = 32, 32
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 5) % 256, (y * 3) % 256, ((x + y)) % 256], axis=-1).astype(
        np.uint8
    )
    assert len(encode_jpeg(img, subsampling="420")) < len(
        encode_jpeg(img, subsampling="444")
    )


def test_decode_media_dispatch():
    from dawnsearch_spark.operators.multimodal import decode_media

    img = np.full((10, 12, 3), [5, 250, 77], np.uint8)
    out = decode_media(encode_jpeg(img), "image/jpeg")
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00" * 16, "audio/mp3")
