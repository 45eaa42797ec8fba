"""SSIMULACRA2 metric behavior tests (SURVEY.md §4b).

Without a trusted native fssimu2 in this environment, these anchor the
invariants the TQ loop depends on: exact 100 at identity, monotone decrease
under growing distortion, batch/single consistency, and sane magnitudes for
codec-like distortions.
"""

import numpy as np
import pytest

from oavif_tpu.metric import (
    compute_ssimulacra2,
    compute_ssimulacra2_batch,
)


def test_identity_scores_100(test_rgb8):
    s = compute_ssimulacra2(test_rgb8, test_rgb8)
    assert abs(s - 100.0) < 1e-3


def test_monotone_under_noise(test_rgb8, rng):
    scores = []
    for sigma in (1, 4, 10, 25):
        noisy = np.clip(
            test_rgb8.astype(np.float64) + rng.normal(0, sigma, test_rgb8.shape),
            0,
            255,
        ).astype(np.uint8)
        scores.append(compute_ssimulacra2(test_rgb8, noisy))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] < 100.0
    assert scores[-1] < 60.0  # sigma-25 noise is clearly bad


def test_blur_detected_as_detail_loss(test_rgb8):
    from scipy.ndimage import gaussian_filter

    blurred = gaussian_filter(test_rgb8.astype(np.float64), (2.0, 2.0, 0))
    s = compute_ssimulacra2(test_rgb8, np.clip(blurred, 0, 255).astype(np.uint8))
    assert s < 80.0


def test_codec_distortion_in_plausible_band(test_rgb8):
    # A q≈85 AVIF encode should land in the "high quality" band.
    import io as stdio

    from PIL import Image as PILImage

    buf = stdio.BytesIO()
    PILImage.fromarray(test_rgb8).save(buf, format="AVIF", quality=85, speed=9)
    buf.seek(0)
    dec = np.asarray(PILImage.open(buf).convert("RGB"))
    s = compute_ssimulacra2(test_rgb8, dec)
    assert 55.0 < s < 99.5, s


def test_batch_matches_single(test_rgb8, rng):
    dists = []
    for sigma in (2, 8):
        d = np.clip(
            test_rgb8.astype(np.float64) + rng.normal(0, sigma, test_rgb8.shape),
            0,
            255,
        ).astype(np.uint8)
        dists.append(d)
    batch = compute_ssimulacra2_batch(test_rgb8, np.stack(dists))
    singles = [compute_ssimulacra2(test_rgb8, d) for d in dists]
    np.testing.assert_allclose(batch, singles, rtol=0, atol=1e-3)


def test_small_image_rejected():
    tiny = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError):
        compute_ssimulacra2(tiny, tiny)


def test_shape_mismatch_rejected(test_rgb8):
    with pytest.raises(ValueError):
        compute_ssimulacra2(test_rgb8, test_rgb8[:-8])
