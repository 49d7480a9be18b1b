"""Codec + phash unit tests (SURVEY.md §5.2 layer 1; BASELINE.json:15 gates)."""

from __future__ import annotations

import numpy as np
import pytest

from engine import codec


def _image(rng, h, w):
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    return ((x + y) / 2 + rng.normal(0, 30, (h, w, 3))).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(16, 16), (16, 17), (33, 64), (8, 8), (31, 9)])
def test_raw16_lossless_roundtrip(h, w):
    img = _image(np.random.default_rng(h * 100 + w), h, w)
    assert np.array_equal(codec.decode(codec.encode(img, "raw16"), "raw16"), img)


@pytest.mark.parametrize("h,w", [(16, 16), (16, 17), (33, 64), (64, 64)])
def test_qdct_psnr_gate(h, w):
    img = _image(np.random.default_rng(h + w), h, w)
    dec = codec.decode(codec.encode(img, "qdct"), "qdct")
    assert codec.psnr(img, dec) >= 40.0
    assert dec.shape == img.shape


def test_qdct_worst_case_noise_still_meets_gate():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert codec.psnr(img, codec.decode(codec.encode(img, "qdct"), "qdct")) >= 40.0


def test_encode_decode_deterministic():
    img = _image(np.random.default_rng(1), 24, 24)
    assert codec.encode(img, "qdct") == codec.encode(img, "qdct")
    assert codec.encode(img, "raw16") == codec.encode(img, "raw16")


def test_fmt_mismatch_raises():
    img = _image(np.random.default_rng(2), 16, 16)
    with pytest.raises(ValueError):
        codec.decode(codec.encode(img, "raw16"), "qdct")
    with pytest.raises(ValueError):
        codec.encode(img, "jpeg2000")


def test_phash_properties():
    rng = np.random.default_rng(3)
    img = _image(rng, 32, 32)
    h1 = codec.phash64(img)
    assert codec.phash64(img.copy()) == h1  # deterministic
    # tiny perturbation -> small hamming distance
    img2 = img.copy()
    img2[0, 0] = 255 - img2[0, 0]
    d_small = codec.hamming64(np.array([h1]), np.array([codec.phash64(img2)]))[0]
    # unrelated image -> large hamming distance
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    d_big = codec.hamming64(np.array([h1]), np.array([codec.phash64(other)]))[0]
    assert d_small <= 6 < d_big


def test_phash_survives_lossy_roundtrip():
    img = _image(np.random.default_rng(4), 48, 48)
    h_orig = codec.phash64(img)
    h_lossy = codec.phash64(codec.decode(codec.encode(img, "qdct"), "qdct"))
    assert codec.hamming64(np.array([h_orig]), np.array([h_lossy]))[0] <= 4
