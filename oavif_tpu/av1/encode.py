"""Top-level AVIF encode: the TPU backend's entry point.

Pipeline (reference behavior: io.zig:544-636 encodeAvifToBuffer):
  RGB → YUV444 → AV1 intra frame encode (oavif_tpu.av1.frame) →
  OBU assembly (oavif_tpu.av1.obu) → ISOBMFF mux (oavif_tpu.av1.mux).

Returns standard AVIF bytes decodable by any conformant decoder. The
frame encoder also returns the reconstruction, which equals the decoder's
output bit-exactly (coding tools configured for no post-filters) — the TQ
loop scores that recon directly instead of round-tripping bytes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..backend import EncCtx
from .consts import quality_to_qindex
from .frame import encode_frame_planes
from .mux import mux_avif
from .obu import FrameConfig, SequenceConfig, assemble_av1_stream
from .yuv import rgb_to_yuv444, yuv444_to_rgb


def encode_avif(ctx: EncCtx) -> bytes:
    data, _ = encode_avif_with_recon(ctx)
    return data


def encode_avif_with_recon(ctx: EncCtx) -> Tuple[bytes, np.ndarray]:
    """Encode per ctx options at quantizer ctx.q; returns (avif bytes,
    reconstructed RGB8 for in-loop scoring)."""
    o = ctx.o
    src = ctx.src
    d = src.data
    if src.hbd:
        d = (d >> 8).astype(np.uint8)  # 8-bit path first (io.zig:602 16→8)
    if src.channels == 1 or (d.ndim == 3 and d.shape[2] == 1):
        d = np.repeat(d.reshape(d.shape[0], d.shape[1], 1), 3, axis=2)
    rgb = d[..., :3]

    qindex = quality_to_qindex(ctx.q)
    # qindex 0 is lossless mode (different coding path); clamp to 1 until
    # the lossless path lands.
    qindex = max(qindex, 1)

    planes = rgb_to_yuv444(rgb, bitdepth=8)
    payload, recon_planes = encode_frame_planes(
        planes, qindex, bitdepth=8, speed=o.speed
    )

    h, w = planes[0].shape
    seq = SequenceConfig(
        width=w,
        height=h,
        bit_depth=8,
        color_primaries=o.color_primaries,
        transfer_characteristics=o.transfer_characteristics,
        matrix_coefficients=o.matrix_coefficients,
    )
    frame = FrameConfig(width=w, height=h, base_q_idx=qindex)
    av1 = assemble_av1_stream(seq, frame, [payload])

    avif = mux_avif(
        av1,
        w,
        h,
        bit_depth=8,
        cicp=(o.color_primaries, o.transfer_characteristics, o.matrix_coefficients),
        icc=src.icc,
    )
    recon_rgb = yuv444_to_rgb(recon_planes, bitdepth=8)
    return avif, recon_rgb
