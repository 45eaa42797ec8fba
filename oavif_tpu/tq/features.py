"""Content-aware TQ seed: cheap host features -> per-image seed offset.

The reference's seed is content-blind (q = 6.83*e^{0.0282*tgt},
tq.zig:40-43). Measured with this encoder at target 80, the blind seed's
score spans ~68..91 across content classes — noisy content needs a much
higher quality setting than flat/graphic content to reach the same
SSIMULACRA2 score, which costs 1..3 extra search passes per image.

This module predicts the offset from four O(n) luma statistics (a ~2 ms
numpy pass at 512^2 against a ~130 ms search pass):

  lap    mean |4-neighbour Laplacian|  — noise + fine detail energy
  grad   mean |dx|+|dy|                — structure/edge energy
  ratio  lap/(grad+0.5)                — noise-vs-structure discriminator
         (white noise scores ~1.9, clean edges/gradients ~0.9)
  flat   fraction of 16x16 blocks with std < 2.5 — graphic/screen content

Coefficients are fitted by tools/calibrate_content_seed.py on a corpus of
the same content FAMILIES as the bench corpus but different generator
seeds and parameters (plus blur/noise/gradient families the bench lacks),
against the product encoder's true q at score 80. The correction is
applied additively to the native-calibrated base line 0.62*tgt + 36
(tq/search.py predict_q_native); it shifts the seed, not the search
semantics — every subsequent pass still follows the reference
interpolation loop exactly.
"""

from __future__ import annotations

import math

import numpy as np

# fitted by tools/calibrate_content_seed.py (see module docstring);
# order: [lap, grad, ratio, flat, intercept]
SEED_COEF = np.array([0.0, 0.0, 0.0, 0.0, 0.0])

# offsets beyond the calibration envelope are extrapolation — clamp
SEED_DQ_CLAMP = 12.0


def content_features(rgb8: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> feature vector [lap, grad, ratio, flat]."""
    a = rgb8.astype(np.float32)
    y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    gx = np.abs(np.diff(y, axis=1)).mean()
    gy = np.abs(np.diff(y, axis=0)).mean()
    grad = float(gx + gy)
    lap = float(
        np.abs(
            4.0 * y[1:-1, 1:-1]
            - y[:-2, 1:-1]
            - y[2:, 1:-1]
            - y[1:-1, :-2]
            - y[1:-1, 2:]
        ).mean()
    )
    ratio = lap / (grad + 0.5)
    h, w = y.shape
    hb, wb = h // 16, w // 16
    if hb and wb:
        blocks = y[: hb * 16, : wb * 16].reshape(hb, 16, wb, 16)
        bstd = blocks.std(axis=(1, 3))
        flat = float((bstd < 2.5).mean())
    else:
        flat = 0.0
    return np.array([lap, grad, ratio, flat], dtype=np.float64)


def seed_offset(features: np.ndarray) -> float:
    """Fitted dq for one feature vector (0.0 until calibrated)."""
    dq = float(np.dot(SEED_COEF[:-1], features) + SEED_COEF[-1])
    return max(-SEED_DQ_CLAMP, min(SEED_DQ_CLAMP, dq))


def predict_q_content(tgt: float, rgb8: np.ndarray) -> int:
    """Content-aware seed: native base line + fitted feature offset."""
    q = 0.62 * tgt + 36.0 + seed_offset(content_features(rgb8))
    r = math.floor(q + 0.5) if q >= 0 else math.ceil(q - 0.5)
    return int(min(max(r, 0.0), 100.0))
