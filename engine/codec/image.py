"""Deterministic raw/DCT image codecs.

Byte layouts (little-endian):

``raw16``  b"R16\\x00" | w:uint16 | h:uint16 | c:uint8 | pixels uint8 (h, w, c)
``qdct``   b"QDC\\x00" | w:uint16 | h:uint16 | c:uint8 | int16 quantized
           DCT coefficients of 8x8 blocks (pixels edge-padded to
           multiples of 8), block-raster order, per channel.

``qdct`` uses an orthonormal DCT-II (matrix form) and a uniform
quantization step ``QSTEP``; quantization error per coefficient is
<= QSTEP/2, giving an MSE bound of QSTEP^2/12 ~= 3.0 for QSTEP=6 →
PSNR >= 10*log10(255^2/3) ≈ 43 dB, comfortably above the 40 dB gate
(BASELINE.json:15). Codec state (the DCT basis) is cheap but is still
cached per decoder actor (SURVEY.md T3) to model real codec tables.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_RAW = b"R16\x00"
MAGIC_QDCT = b"QDC\x00"
QSTEP = 6.0
FORMATS = ("raw16", "qdct")

_HDR = struct.Struct("<4sHHB")


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT8 = _dct_matrix(8)


def _to_blocks(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(H, W) -> (nb, 8, 8) edge-padded blocks + padded dims."""
    h, w = ch.shape
    ph, pw = -h % 8, -w % 8
    ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    hh, ww = ch.shape
    blocks = ch.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, hh, ww


def _from_blocks(blocks: np.ndarray, hh: int, ww: int, h: int, w: int) -> np.ndarray:
    ch = (
        blocks.reshape(hh // 8, ww // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(hh, ww)
    )
    return ch[:h, :w]


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """(h, w, c) uint8 -> encoded bytes in ``fmt``."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    hdr_magic = {"raw16": MAGIC_RAW, "qdct": MAGIC_QDCT}.get(fmt)
    if hdr_magic is None:
        raise ValueError(f"unknown fmt {fmt!r}")
    hdr = _HDR.pack(hdr_magic, w, h, c)
    if fmt == "raw16":
        return hdr + pixels.tobytes()
    # qdct
    out = [hdr]
    for ci in range(c):
        blocks, hh, ww = _to_blocks(pixels[:, :, ci].astype(np.float64) - 128.0)
        coef = _DCT8 @ blocks @ _DCT8.T
        q = np.rint(coef / QSTEP).astype(np.int16)
        out.append(q.tobytes())
    return b"".join(out)


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Encoded bytes -> (h, w, c) uint8 pixels. ``fmt`` cross-checked."""
    magic, w, h, c = _HDR.unpack_from(data, 0)
    body = memoryview(data)[_HDR.size :]
    if magic == MAGIC_RAW:
        if fmt not in (None, "raw16"):
            raise ValueError(f"fmt tag {fmt!r} != payload magic raw16")
        return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)
    if magic == MAGIC_QDCT:
        if fmt not in (None, "qdct"):
            raise ValueError(f"fmt tag {fmt!r} != payload magic qdct")
        hh, ww = h + (-h % 8), w + (-w % 8)
        nb = (hh // 8) * (ww // 8)
        out = np.empty((h, w, c), dtype=np.uint8)
        q = np.frombuffer(body, dtype=np.int16).reshape(c, nb, 8, 8)
        for ci in range(c):
            coef = q[ci].astype(np.float64) * QSTEP
            blocks = _DCT8.T @ coef @ _DCT8
            ch = _from_blocks(blocks, hh, ww, h, w) + 128.0
            out[:, :, ci] = np.clip(np.rint(ch), 0, 255).astype(np.uint8)
        return out
    raise ValueError(f"unknown magic {magic!r}")


def decode_batch(datas, fmts) -> list[np.ndarray]:
    """Decode a batch (list of bytes) — the per-batch body of the T3 actor."""
    return [decode(d, f) for d, f in zip(datas, fmts)]


def header(data: bytes) -> tuple[bytes, int, int, int]:
    """(magic, w, h, c) of an encoded payload (cheap, no decode)."""
    return _HDR.unpack_from(data, 0)


def decode_same_shape(datas: list[bytes], magic: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Decode N same-header payloads to one (N, h, w, c) uint8 stack.

    Bit-identical to per-image ``decode`` (same stacked-matmul kernel,
    just a longer leading axis), amortizing Python/alloc overhead —
    the vectorized body of the T3 decoder (SURVEY.md §2.3)."""
    n = len(datas)
    if magic == MAGIC_RAW:
        flat = np.frombuffer(b"".join(datas), dtype=np.uint8)
        body = flat.reshape(n, _HDR.size + h * w * c)[:, _HDR.size:]
        return body.reshape(n, h, w, c)
    if magic != MAGIC_QDCT:
        raise ValueError(f"unknown magic {magic!r}")
    hh, ww = h + (-h % 8), w + (-w % 8)
    nb = (hh // 8) * (ww // 8)
    flat = np.frombuffer(b"".join(datas), dtype=np.uint8)
    body = flat.reshape(n, _HDR.size + c * nb * 128)[:, _HDR.size:].copy()
    q = body.view(np.int16).reshape(n, c, nb, 8, 8)
    coef = q.astype(np.float64) * QSTEP
    blocks = _DCT8.T @ coef.reshape(-1, 8, 8) @ _DCT8
    ch = (
        blocks.reshape(n, c, hh // 8, ww // 8, 8, 8)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(n, c, hh, ww)[:, :, :h, :w]
    ) + 128.0
    out = np.clip(np.rint(ch), 0, 255).astype(np.uint8)
    return out.transpose(0, 2, 3, 1)  # (n, h, w, c)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
