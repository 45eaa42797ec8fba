"""Randomized conformance sweep: every stream the encoder emits across
content classes, sizes (odd/tiny), qualities, depths and alpha must decode
through the independent decoder to exactly the encoder's reconstruction
(+-1 RGB conversion window)."""

import io as iomod
import zlib

import numpy as np
import pytest
from PIL import Image as PILImage

from oavif_tpu.av1.encode import encode_avif_with_recon
from oavif_tpu.backend import EncCtx
from oavif_tpu.io.image import Image
from oavif_tpu.options import EncOptions


def _content(kind, h, w, rng):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    if kind == "noise":
        return np.clip(rng.normal(128, 45, (h, w, 3)), 0, 255).astype(np.uint8)
    if kind == "gradient":
        g = np.stack([50 + 0.7 * xx, 90 + 0.5 * yy, 220 - 0.4 * (xx + yy)], -1)
        return np.clip(g + rng.normal(0, 2, (h, w, 3)), 0, 255).astype(np.uint8)
    if kind == "edges":
        g = np.stack([np.where((xx // 24 + yy // 16) % 2 == 0, 210, 60)] * 3, -1)
        return np.clip(g + rng.normal(0, 3, (h, w, 3)), 0, 255).astype(np.uint8)
    L = np.clip(128 + 100 * np.sin(xx / 13) * np.cos(yy / 19), 0, 255)
    return np.clip(np.stack([L, L * 0.7 + 40, 255 - L * 0.6], -1),
                   0, 255).astype(np.uint8)


CASES = [
    ("noise", (64, 64), 30, False, False),
    ("noise", (96, 130), 55, False, False),
    ("gradient", (128, 128), 70, False, False),
    ("gradient", (72, 40), 88, True, False),
    ("edges", (128, 96), 60, False, True),
    ("edges", (48, 48), 92, False, False),
    ("correlated", (128, 128), 75, False, False),
    ("correlated", (80, 104), 45, True, True),
]


@pytest.mark.parametrize("kind,shape,q,tenbit,alpha", CASES)
def test_fuzz_stream_conformance(kind, shape, q, tenbit, alpha):
    rng = np.random.default_rng(zlib.crc32(f"{kind}{shape}{q}".encode()))
    h, w = shape
    img = _content(kind, h, w, rng)
    if alpha:
        a = np.clip(rng.normal(180, 60, (h, w)), 0, 255).astype(np.uint8)
        data_in = np.dstack([img, a])
        src = Image(width=w, height=h, channels=4, hbd=False, data=data_in)
    else:
        src = Image(width=w, height=h, channels=3, hbd=False, data=img)
    ctx = EncCtx(o=EncOptions(tenbit=tenbit), src=src, rgb=img, w=w, h=h, q=q)
    data, recon = encode_avif_with_recon(ctx)
    im = PILImage.open(iomod.BytesIO(data))
    im.load()
    dec = np.asarray(im.convert("RGB"))
    tol = 3 if tenbit else 1  # 10->8 RGB window rounding differs
    assert np.abs(dec.astype(int) - recon.astype(int)).max() <= tol


@pytest.mark.parametrize("seed", [4, 7, 13, 51])
def test_noise_odd_size_regression(seed):
    """Regression: loop filtering must run on the padded mi grid — edges in
    the padding write into visible pixels (failed on these seeds before)."""
    rng = np.random.default_rng(seed)
    img = np.clip(rng.normal(128, 45, (96, 130, 3)), 0, 255).astype(np.uint8)
    src = Image(width=130, height=96, channels=3, hbd=False, data=img)
    ctx = EncCtx(o=EncOptions(tenbit=False), src=src, rgb=img, w=130, h=96,
                 q=55)
    data, recon = encode_avif_with_recon(ctx)
    im = PILImage.open(iomod.BytesIO(data))
    im.load()
    dec = np.asarray(im.convert("RGB"))
    assert np.abs(dec.astype(int) - recon.astype(int)).max() <= 1


@pytest.mark.parametrize("seed", [5001, 5002, 5004, 5007, 5013, 5017])
def test_product_path_random_roundtrip_exact(seed):
    """Full encode_avif_with_recon (LF + CDEF search + mux, random size /
    quality / depth / alpha) must return a recon equal to the decoder's
    output — the in-loop scoring contract end to end."""
    import numpy as np

    from oavif_tpu.av1.encode import encode_avif_with_recon
    from oavif_tpu.av1.yuv import yuv444_to_rgb
    from oavif_tpu.backend import EncCtx
    from oavif_tpu.io.avif_ctypes import decode_to_yuv
    from oavif_tpu.io.image import Image
    from oavif_tpu.options import EncOptions

    rng = np.random.default_rng(seed)
    w = int(rng.integers(20, 260))
    h = int(rng.integers(20, 260))
    q = int(rng.integers(5, 101))
    tenbit = bool(seed % 4 == 1)
    alpha = seed % 5 == 2
    kind = seed % 3
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    if kind == 0:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    elif kind == 1:
        img = np.clip(np.stack([xx * 255 / max(w, 1), yy * 255 / max(h, 1),
                                (xx + yy) * 127 / (w + h)], -1),
                      0, 255).astype(np.uint8)
    else:
        img = np.clip(np.stack([128 + 90 * np.sin(xx / 9),
                                120 + 70 * np.cos(yy / 7),
                                110 + 80 * np.sin((xx + yy) / 11)], -1)
                      + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(np.uint8)
    if alpha:
        a = rng.integers(0, 256, (h, w, 1)).astype(np.uint8)
        src = Image(width=w, height=h, channels=4, hbd=False,
                    data=np.concatenate([img, a], axis=2))
    else:
        src = Image(width=w, height=h, channels=3, hbd=False, data=img)
    ctx = EncCtx(o=EncOptions(tenbit=tenbit, quality_alpha=80), src=src,
                 rgb=img, w=w, h=h, q=q)
    data, recon_rgb = encode_avif_with_recon(ctx)
    yuv, depth, _ = decode_to_yuv(data)
    dec_rgb = yuv444_to_rgb([np.asarray(p, np.int32) for p in yuv],
                            bitdepth=depth)
    np.testing.assert_array_equal(dec_rgb, recon_rgb)
