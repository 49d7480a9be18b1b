"""From-scratch deterministic image codecs + perceptual hash (pure numpy).

No image library exists in this sandbox (no Pillow/opencv, SURVEY.md
§7.1), so the engine defines its own byte formats for the ``bytes`` /
``fmt`` columns of the Lance-shaped ``images`` table (BASELINE.json:15):

- ``raw16``  lossless: header + raw uint8 RGB pixels
- ``qdct``   lossy: 8x8 block DCT-II + uniform quantization, tuned so
             PSNR >= 40 dB by construction (BASELINE.json:15 gate)
- ``phash``  64-bit DCT perceptual hash over decoded pixels

``encode``/``decode`` dispatch on the ``fmt`` tag. All functions are
deterministic (no wall clock, no RNG) so fixtures regenerate
byte-identically (FIXTURES.md §B.4).
"""

from engine.codec.image import (  # noqa: F401
    decode,
    decode_batch,
    encode,
    psnr,
    FORMATS,
)
from engine.codec.phash import phash64, phash64_batch, hamming64  # noqa: F401
