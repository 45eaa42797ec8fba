"""Calibrate the content-aware TQ seed (tq/features.py).

The reference seeds the search content-blind (q = 6.83*e^{0.0282*tgt},
tq.zig:40-43); our native-calibrated line (q = 0.62*tgt + 36) is equally
blind. Measured on the 6-class bench corpus the seed's score at tgt=80
spans 68..91 — content decides +-8 quality steps, which costs one to three
extra search passes per image. This tool fits the correction:

    q_seed(tgt, image) = 0.62*tgt + 36 + dq(features(image))

Method: generate a calibration corpus that covers the same content
*families* as the bench corpus but from DIFFERENT generator seeds and
parameters (plus extra families: blur, plain noise at several sigmas,
gradients), binary-search each image's true q* at score 80 with the
product encoder (tolerance 0.5), compute the cheap host features, and fit
dq by least squares with a small ridge. Prints the fitted coefficients
(to paste into tq/features.py) and a leave-one-out validation table.

Run:  JAX_PLATFORMS=cpu python tools/calibrate_content_seed.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


# ---- calibration corpus (generator families match bench.py, parameters
# and seeds deliberately different) ------------------------------------


def img_sinusoid(h, w, seed, noise):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    f1, f2, f3 = rng.uniform(12, 35, 3)
    img = np.stack(
        [
            128 + 100 * np.sin(xx / f1) * np.cos(yy / (f1 + 6)),
            120 + 80 * np.cos(xx / f2) + 20 * np.sin(yy / 7.0),
            100 + 90 * np.sin((xx + yy) / f3),
        ],
        -1,
    )
    img += rng.normal(0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def img_fractal(h, w, seed, alpha=1.0, contrast=175):
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    rad = np.sqrt(fy * fy + fx * fx)
    rad[0, 0] = 1.0
    chans = []
    for _ in range(3):
        spec = (rng.normal(size=(h, w)) + 1j * rng.normal(size=(h, w))) / (
            rad**alpha
        )
        f = np.real(np.fft.ifft2(spec))
        f = (f - f.min()) / (f.max() - f.min())
        chans.append(40 + contrast * f)
    return np.clip(np.stack(chans, -1), 0, 255).astype(np.uint8)


def img_edges(h, w, seed, n=14):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 230, np.float64)
    for _ in range(n):
        x0, y0 = rng.integers(0, w - 40), rng.integers(0, h - 40)
        ww, hh = rng.integers(20, 160, 2)
        col = rng.integers(0, 255, 3)
        img[y0 : y0 + hh, x0 : x0 + ww] = col
    return np.clip(img, 0, 255).astype(np.uint8)


def img_oriented(h, w, seed, freq=9.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ang = rng.uniform(0.3, 1.2)
    u = xx * np.cos(ang) + yy * np.sin(ang)
    base = 128 + 90 * np.sin(u / freq)
    img = np.stack([base, base * 0.9 + 10, base * 0.8 + 25], -1)
    img += rng.normal(0, 2.5, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def img_text(h, w, seed, density=160):
    rng = np.random.default_rng(seed)
    yy = np.mgrid[0:h, 0:w][0].astype(np.float64)
    img = np.stack([200 + 40 * yy / h, 210 + 30 * yy / h, 225 + 20 * yy / h], -1)
    for _ in range(density):
        x0, y0 = rng.integers(4, w - 12), rng.integers(4, h - 14)
        glyph = rng.random((10, 7)) > 0.5
        col = float(rng.integers(0, 70))
        for c in range(3):
            ch = img[y0 : y0 + 10, x0 : x0 + 7, c]
            ch[glyph] = col
    return np.clip(img, 0, 255).astype(np.uint8)


def img_mixed(h, w, seed):
    rng = np.random.default_rng(seed)
    img = img_fractal(h, w, seed + 1)
    for _ in range(5):
        x0, y0 = rng.integers(0, w - 128, 2)
        img[y0 : y0 + 128, x0 : x0 + 128] = rng.integers(0, 255, 3)
    noise_blk = rng.normal(128, 30, (128, 128, 3))
    img[h - 128 :, w - 128 :] = np.clip(noise_blk, 0, 255)
    return img.astype(np.uint8)


def img_noise(h, w, seed, sigma):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(128, sigma, (h, w, 3)), 0, 255).astype(np.uint8)


def img_blurphoto(h, w, seed):
    base = img_fractal(h, w, seed).astype(np.float64)
    k = 5
    out = base.copy()
    for _ in range(2):
        out = (
            np.roll(out, 1, 0) + np.roll(out, -1, 0) + np.roll(out, 1, 1)
            + np.roll(out, -1, 1) + out
        ) / 5.0
    del k
    return np.clip(out, 0, 255).astype(np.uint8)


def corpus():
    h = w = 512
    out = []
    for s, n in ((101, 3), (102, 6), (103, 12)):
        out.append((f"sin{s}_n{n}", img_sinusoid(h, w, s, n)))
    for s, a in ((104, 1.0), (105, 1.2), (106, 0.8)):
        out.append((f"fract{s}_a{a}", img_fractal(h, w, s, a)))
    for s, n in ((107, 10), (108, 24)):
        out.append((f"edges{s}_{n}", img_edges(h, w, s, n)))
    for s, f in ((109, 7.0), (110, 14.0)):
        out.append((f"orient{s}_{f}", img_oriented(h, w, s, f)))
    for s, d in ((111, 100), (112, 240)):
        out.append((f"text{s}_{d}", img_text(h, w, s, d)))
    for s in (113, 114):
        out.append((f"mixed{s}", img_mixed(h, w, s)))
    out.append(("noise_s8", img_noise(h, w, 115, 8)))
    out.append(("blur116", img_blurphoto(h, w, 116)))
    out.append(("blur117", img_blurphoto(h, w, 117)))
    return out


def true_q_at(ctx_img, tgt=80.0):
    """Product-encoder search with tight tolerance for the ground truth."""
    from oavif_tpu.backend import EncCtx
    from oavif_tpu.backend.tpu import TpuBackend
    from oavif_tpu.io.image import Image
    from oavif_tpu.options import EncOptions
    from oavif_tpu.tq.driver import search_encode

    h, w = ctx_img.shape[:2]
    ctx = EncCtx(
        o=EncOptions(speed=9, score_tgt=tgt, tolerance=0.5, max_pass=10),
        src=Image(width=w, height=h, channels=3, hbd=False, data=ctx_img),
        rgb=ctx_img,
        w=w,
        h=h,
    )
    r, _ = search_encode(ctx, TpuBackend())
    return r.q, r.score, r.num_pass


def main():
    from oavif_tpu.tq.features import content_features

    rows = []
    for name, img in corpus():
        q, score, np_ = true_q_at(img)
        f = content_features(img)
        rows.append((name, q, score, f))
        print(f"{name:16s} q*={q:3d} score={score:6.2f} passes={np_} "
              f"feat={np.round(f, 3)}")

    base = 0.62 * 80 + 36.0
    X = np.stack([r[3] for r in rows])
    yv = np.array([r[1] - base for r in rows])
    # ridge LS with intercept
    A = np.hstack([X, np.ones((len(X), 1))])
    lam = 1.0
    reg = lam * np.eye(A.shape[1])
    reg[-1, -1] = 0.0
    coef = np.linalg.solve(A.T @ A + reg, A.T @ yv)
    pred = A @ coef
    print("\ncoef (paste into tq/features.py SEED_COEF):")
    print(repr(coef))
    print(f"fit rms={np.sqrt(np.mean((pred - yv) ** 2)):.2f} "
          f"max|err|={np.max(np.abs(pred - yv)):.2f}")
    # leave-one-out
    errs = []
    for i in range(len(rows)):
        m = np.ones(len(rows), bool)
        m[i] = False
        c = np.linalg.solve(
            A[m].T @ A[m] + reg, A[m].T @ yv[m]
        )
        errs.append(A[i] @ c - yv[i])
    print("LOO rms=%.2f max=%.2f" % (
        np.sqrt(np.mean(np.square(errs))), np.max(np.abs(errs))))
    for (name, q, s, _), e in zip(rows, errs):
        print(f"  {name:16s} q*={q:3d} loo_err={e:+.1f}")


if __name__ == "__main__":
    main()
