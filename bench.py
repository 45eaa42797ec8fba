"""Round benchmark: MP/s at SSIMULACRA2 target 80 (tolerance 2).

Prints ONE JSON line {"metric","value","unit","vs_baseline"}.

ours      = oavif-tpu: from-scratch AV1 encoder (native entropy/transform
            runtime) + on-TPU SSIMULACRA2, TQ scored on the encoder's own
            reconstruction (no decode round-trip).
baseline  = the reference's exact native stack (libaom via libavif encode +
            decode round-trip) with the metric on CPU — the self-baseline
            BASELINE.md prescribes (the reference publishes no numbers).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def _test_image(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
            120 + 80 * np.cos(xx / 29.0) + 20 * np.sin(yy / 7.0),
            100 + 90 * np.sin((xx + yy) / 31.0),
        ],
        -1,
    )
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _make_ctx(img):
    from oavif_tpu.backend import EncCtx
    from oavif_tpu.io.image import Image
    from oavif_tpu.options import EncOptions

    h, w = img.shape[:2]
    return EncCtx(
        o=EncOptions(speed=9),
        src=Image(width=w, height=h, channels=3, hbd=False, data=img),
        rgb=img,
        w=w,
        h=h,
    )


def _tq(probe, tgt=80.0, tol=2.0, max_pass=6):
    from oavif_tpu.tq import find_target_quality

    return find_target_quality(probe, tgt, tol, max_pass)


def main():
    size = int(os.environ.get("BENCH_SIZE", "512"))
    img = _test_image(size, size)
    mp = img.shape[0] * img.shape[1] / 1e6

    from oavif_tpu.backend.oracle import OracleBackend
    from oavif_tpu.backend.tpu import TpuBackend
    from oavif_tpu.metric import compute_ssimulacra2

    _ = compute_ssimulacra2(img, img)  # compile outside timed region

    # ---- ours (batched speculative search; BASELINE config 2) ----
    from oavif_tpu.tq.driver import search_encode

    tpu = TpuBackend()

    warm = _make_ctx(img)
    warm.o.max_pass = 1
    search_encode(warm, tpu)  # warm code paths + compile the batch scorer

    ours_s = None
    for _ in range(2):  # best-of-2: single-core host timing is noisy
        ctx = _make_ctx(img)
        t0 = time.time()
        res, ours_data = search_encode(ctx, tpu)
        dt = time.time() - t0
        if ours_s is None or dt < ours_s:
            ours_s = dt
        res.num_pass = ctx.num_pass
    ours_mps = mp / ours_s

    # ---- baseline: reference stack (libavif/libaom encode + decode
    # round-trip + CPU metric) ----
    import jax

    cpu = jax.devices("cpu")[0]

    def metric_cpu(a, b):
        import jax.numpy as jnp

        from oavif_tpu.metric.ssimulacra2 import (
            ssimulacra2_from_precomputed,
            ssimulacra2_precompute_ref,
        )

        with jax.default_device(cpu):
            pyr = ssimulacra2_precompute_ref(jnp.asarray(a))
            return float(ssimulacra2_from_precomputed(pyr, jnp.asarray(b)))

    oracle = OracleBackend()
    bctx = _make_ctx(img)

    def probe_base(q):
        bctx.q = q
        data = oracle.encode(bctx)
        dec = oracle.decode_to_rgb8(data)
        return metric_cpu(img, dec)

    _ = metric_cpu(img, img)
    base_s = None
    for _ in range(2):
        bctx.num_pass = 0
        t0 = time.time()
        res_b = _tq(probe_base)
        dt = time.time() - t0
        if base_s is None or dt < base_s:
            base_s = dt
    base_mps = mp / base_s

    print(
        json.dumps(
            {
                "metric": "MP/s at SSIMULACRA2 tgt 80 (tol 2), single image",
                "value": round(ours_mps, 4),
                "unit": "MP/s",
                "vs_baseline": round(ours_mps / base_mps, 3) if base_mps else None,
                "detail": {
                    "ours_s": round(ours_s, 3),
                    "ours_passes": res.num_pass,
                    "ours_q": res.q,
                    "ours_score": round(res.score, 2),
                    "ours_bytes": len(ours_data),
                    "baseline_s": round(base_s, 3),
                    "baseline_passes": res_b.num_pass,
                    "baseline_q": res_b.q,
                    "baseline_score": round(res_b.score, 2),
                    "image": f"{size}x{size}",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
