"""RGB ↔ YUV444 conversion.

The reference encodes YUV444 via avifImageRGBToYUV (io.zig:578) with the
CICP matrix coefficients defaulting to "unspecified" (2), which libavif
maps to BT.601. We mirror that with full-range BT.601. The RGB→YUV
direction is encoder freedom; YUV→RGB here mirrors the decode-side
conversion for in-loop scoring (the conformance tests compare recon in
YUV space against the oracle decoder's planes, which is exact).
"""

from __future__ import annotations

import numpy as np

KR, KB = 0.299, 0.114
KG = 1.0 - KR - KB


def rgb_to_yuv444(rgb: np.ndarray, bitdepth: int = 8):
    """(h, w, 3) uint8/uint16 full-range RGB → [y, u, v] int32 planes."""
    maxv = (1 << bitdepth) - 1
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = KR * r + KG * g + KB * b
    u = (b - y) / (2 * (1 - KB)) + (maxv + 1) / 2
    v = (r - y) / (2 * (1 - KR)) + (maxv + 1) / 2
    to = lambda p: np.clip(np.floor(p + 0.5), 0, maxv).astype(np.int32)
    return [to(y), to(u), to(v)]


def yuv444_to_rgb(planes, bitdepth: int = 8) -> np.ndarray:
    """[y, u, v] planes → (h, w, 3) uint8 full-range RGB (decode mirror)."""
    maxv = (1 << bitdepth) - 1
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - (maxv + 1) / 2
    cr = planes[2].astype(np.float64) - (maxv + 1) / 2
    r = y + 2 * (1 - KR) * cr
    b = y + 2 * (1 - KB) * cb
    g = (y - KR * r - KB * b) / KG
    out = np.stack([r, g, b], axis=-1)
    out = np.clip(np.floor(out + 0.5), 0, maxv)
    if bitdepth == 8:
        return out.astype(np.uint8)
    return (out.astype(np.uint16) >> (bitdepth - 8)).astype(np.uint8)
