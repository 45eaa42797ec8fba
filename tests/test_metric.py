"""SSIMULACRA2 metric behavior tests (SURVEY.md §4b).

No SSIMULACRA2 implementation exists on this host to diff against (every
binary was scanned for the distinctive final-pow constant), so alongside the
invariants the TQ loop depends on (exact 100 at identity, monotone decrease
under growing distortion, batch/single consistency) this file pins ABSOLUTE
self-golden scores for fixed distortion fixtures: any change to the weight
vector, nonlinearity, pyramid, or color pipeline shows up as a golden diff.
PARITY.md documents the calibration provenance and expected deviation
sources vs the upstream scale.
"""

import numpy as np
import pytest

from oavif_tpu.metric import (
    compute_ssimulacra2,
    compute_ssimulacra2_batch,
)
from oavif_tpu.metric.ssimulacra2 import WEIGHTS, _num_scales


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


def test_absolute_self_goldens(test_rgb8):
    """Pin absolute scores on deterministic fixtures (CPU path).

    Golden values computed with the v2.1 reconstruction (full 108-weight
    vector incl. the B-channel block, cubic+pow nonlinearity, linear-RGB
    pyramid). Tolerance covers cross-machine float32 conv reassociation.
    """
    from scipy.ndimage import gaussian_filter

    img = test_rgb8
    d_rng = np.random.default_rng(99)
    fixtures = {
        "shift8": (np.clip(img.astype(np.int16) + 8, 0, 255).astype(np.uint8), 79.663),
        "noise3": (
            np.clip(
                img.astype(np.float64) + d_rng.normal(0, 3, img.shape), 0, 255
            ).astype(np.uint8),
            74.265,
        ),
        "blur1": (
            np.clip(gaussian_filter(img.astype(np.float64), (1.0, 1.0, 0)), 0, 255)
            .astype(np.uint8),
            61.817,
        ),
        "quant32": (((img.astype(np.int16) // 32) * 32 + 16).astype(np.uint8), -5.804),
        # heavy chroma distortion must tank the score (exercises the
        # B-channel weight block — all-zero B weights would barely notice)
        "chroma_swap": (img[:, :, [0, 2, 1]], -239.329),
    }
    for name, (dist, golden) in fixtures.items():
        s = compute_ssimulacra2(img, dist)
        assert abs(s - golden) < 0.5, (name, s, golden)


def test_weight_vector_structure():
    w = WEIGHTS.reshape(3, 6, 6)  # (channel X/Y/B, scale, feature)
    assert WEIGHTS.shape == (108,)
    # every channel contributes (round-1 regression: B was all zero)
    for c in range(3):
        assert np.abs(w[c]).sum() > 0, f"channel {c} all zero"
    # the largest fitted weights are the known big entries
    assert WEIGHTS.max() > 200.0 and np.count_nonzero(WEIGHTS) > 45


def test_scale_count_rule():
    # upstream checks the PRE-downsample size: 8x8 -> 2 scales, 32x32 -> 4
    assert _num_scales(8, 8) == 2
    assert _num_scales(32, 32) == 4
    assert _num_scales(512, 512) == 6
    assert _num_scales(7, 512) == 0


def test_8x8_images_score():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert abs(compute_ssimulacra2(img, img) - 100.0) < 1e-3
    noisy = np.clip(
        img.astype(np.float64) + rng.normal(0, 10, img.shape), 0, 255
    ).astype(np.uint8)
    assert compute_ssimulacra2(img, noisy) < 99.0


def test_small_image_rejected():
    tiny = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError):
        compute_ssimulacra2(tiny, tiny)


def test_shape_mismatch_rejected(test_rgb8):
    with pytest.raises(ValueError):
        compute_ssimulacra2(test_rgb8, test_rgb8[:-8])


# ---------------------------------------------------------------------------
# Native (C) implementation — must agree with the JAX reference impl.
# ---------------------------------------------------------------------------


def test_native_matches_jax(test_rgb8, rng):
    """The host-native ssimu2.c and the JAX implementation are independent
    realizations of the same spec; they must agree within epsilon on
    identity, mild, and severe distortion (cross-validation of both)."""
    from oavif_tpu.metric.native import compute_ssimulacra2_native

    if compute_ssimulacra2_native(test_rgb8, test_rgb8) is None:
        pytest.skip("native library unavailable")
    assert abs(compute_ssimulacra2_native(test_rgb8, test_rgb8) - 100.0) < 1e-3
    for sigma in (2, 8, 30):
        d = np.clip(
            test_rgb8.astype(np.float64) + rng.normal(0, sigma, test_rgb8.shape),
            0,
            255,
        ).astype(np.uint8)
        c = compute_ssimulacra2_native(test_rgb8, d)
        j = compute_ssimulacra2(test_rgb8, d)
        assert abs(c - j) < 0.05, (sigma, c, j)


def test_native_ref_cache_consistency(test_rgb8, rng):
    """Scoring through the cached ref-context equals a fresh computation."""
    from oavif_tpu.metric import native

    if not native.available():
        pytest.skip("native library unavailable")
    d = np.clip(
        test_rgb8.astype(np.float64) + rng.normal(0, 6, test_rgb8.shape), 0, 255
    ).astype(np.uint8)
    s1 = native.compute_ssimulacra2_native(test_rgb8, d)
    s2 = native.compute_ssimulacra2_native(test_rgb8, d)  # cached ctx
    assert s1 == s2


def test_batch_auto_matches_single(test_rgb8, rng):
    from oavif_tpu.metric.native import score_batch_auto, metric_impl
    from oavif_tpu.metric.native import compute_ssimulacra2_native

    if metric_impl() != "c":
        pytest.skip("native not selected")
    batch = np.stack(
        [
            np.clip(
                test_rgb8.astype(np.float64) + rng.normal(0, s, test_rgb8.shape),
                0,
                255,
            ).astype(np.uint8)
            for s in (2, 9)
        ]
    )
    out = score_batch_auto(test_rgb8, batch)
    for i in range(2):
        assert out[i] == compute_ssimulacra2_native(test_rgb8, batch[i])


def test_blur_sensitivity_bound(test_rgb8, rng):
    """Bound the blur-implementation deviation source empirically: score
    shift per unit of kernel L1 error is small and roughly linear
    (measured ~0.5-3.7 score / 1% L1 at operating scores). An accurate
    recursive Gaussian of the upstream's class (<~0.3% L1 error) can
    therefore shift scores by at most ~1 point worst-case; see PARITY.md.
    The truncated radius-5 kernel (0.04% L1 error) must stay within 0.5."""
    import importlib
    import os

    import oavif_tpu.metric.ssimulacra2 as M

    dist = np.clip(
        test_rgb8.astype(np.float64) + rng.normal(0, 5, test_rgb8.shape),
        0,
        255,
    ).astype(np.uint8)
    base = M.compute_ssimulacra2(test_rgb8, dist)
    assert M.kernel_l1_error(5) < 0.001
    os.environ["OAVIF_METRIC_BLUR"] = "fir_r5"
    try:
        importlib.reload(M)
        r5 = M.compute_ssimulacra2(test_rgb8, dist)
    finally:
        os.environ.pop("OAVIF_METRIC_BLUR")
        importlib.reload(M)
    assert abs(r5 - base) < 0.5, (base, r5)
