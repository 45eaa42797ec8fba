"""TPU encoder backend — the product encode path.

Orchestrates the JAX/Pallas AV1 intra encoder (oavif_tpu.av1): RGB→YUV444
on device, superblock intra-mode RD search, integer transforms,
quantization, reconstruction, tokenization on device; entropy byte emission
and ISOBMFF muxing on host (reference behavior boundary: SURVEY.md §2b).
"""

from __future__ import annotations

import numpy as np

from . import EncCtx
from ..io.image import decode_avif_to_rgb8


class TpuBackend:
    name = "tpu"

    def encode(self, ctx: EncCtx) -> bytes:
        from ..av1.encode import encode_avif

        return encode_avif(ctx)

    def encode_with_recon(self, ctx: EncCtx):
        """Encode and return (bytes, recon RGB8). The recon equals the
        decoder's output (bit-exact YUV), so the TQ loop scores it directly
        without a decode round-trip (SURVEY.md §2b N3)."""
        from ..av1.encode import encode_avif_with_recon

        return encode_avif_with_recon(ctx)

    def decode_to_rgb8(self, data: bytes) -> np.ndarray:
        # Scoring decode: the conformance-oracle decoder (independent AV1
        # implementation). The in-loop TQ path instead uses the encoder's
        # own on-device reconstruction and never round-trips bytes.
        return decode_avif_to_rgb8(data)
