"""Dump marshaled tile_encode inputs + build a gprof harness for oav1tile.c.

The shared library can't be gprof'd through ctypes, so this dumps every
input buffer tile_encode needs to OUT_DIR, emits a small C main that
replays the call N times, and builds it with -pg. Run:

    python tools/profile_c_tile.py [image] [qindex]   # image: fractal|sinusoid|edges
    cd /tmp/prof3 && ./prof_tile && gprof ./prof_tile gmon.out | head -40
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

OUT = Path("/tmp/prof3")

PROF_MAIN = r"""
/* gprof harness: load dumped tile_encode inputs, run N iterations. */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>

size_t tile_encode(
    const int32_t *const *src_planes, int32_t *const *recon_out,
    int nplanes, int w, int h, int bitdepth, int speed, int qindex,
    int dq_dc, int dq_ac, int dq_ac_uv,
    uint16_t *const *cdf_ptrs, const int32_t *const *scans,
    const int32_t *const *sm_weights,
    const double *const *fhs, const double *const *fws,
    const int32_t *dr_deriv,
    const int32_t *plan, int plan_nbx, int plan_nby,
    int32_t *blocks_out, int32_t *n_blocks_out,
    int32_t *dec_buf, int32_t *dec_len_io, int dec_mode,
    uint8_t **out_payload);
void tile_payload_free(uint8_t *p);

static void *load(const char *name, long *sz) {
    char path[256];
    snprintf(path, sizeof path, "/tmp/prof3/%s", name);
    FILE *f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "missing %s\n", path); exit(1); }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    void *buf = malloc((size_t)n);
    if (fread(buf, 1, (size_t)n, f) != (size_t)n) exit(1);
    fclose(f);
    if (sz) *sz = n;
    return buf;
}

int main(int argc, char **argv) {
    int iters = argc > 1 ? atoi(argv[1]) : 20;
    int w, h, nplanes, qindex, speed, dq_dc, dq_ac, dq_ac_uv, bitdepth;
    int plan_nbx, plan_nby;
    {
        FILE *f = fopen("/tmp/prof3/meta.txt", "r");
        if (fscanf(f, "%d %d %d %d %d %d %d %d %d %d %d", &w, &h, &nplanes,
                   &qindex, &speed, &dq_dc, &dq_ac, &dq_ac_uv, &bitdepth,
                   &plan_nbx, &plan_nby) != 11) return 1;
        fclose(f);
    }
    int32_t *src[3];
    int32_t *recon[3];
    int mi_cols = 2 * ((w + 7) >> 3), mi_rows = 2 * ((h + 7) >> 3);
    char nm[64];
    for (int p = 0; p < nplanes; p++) {
        snprintf(nm, sizeof nm, "src_%d.bin", p);
        src[p] = (int32_t *)load(nm, NULL);
        recon[p] = (int32_t *)calloc((size_t)mi_rows * 4 * mi_cols * 4, 4);
    }
    uint16_t *cdfs[24];
    long cdf_sz[24];
    uint16_t *cdfs0[24];
    for (int i = 0; i < 24; i++) {
        snprintf(nm, sizeof nm, "cdf_%d.bin", i);
        cdfs[i] = (uint16_t *)load(nm, &cdf_sz[i]);
        cdfs0[i] = (uint16_t *)malloc((size_t)cdf_sz[i]);
        memcpy(cdfs0[i], cdfs[i], (size_t)cdf_sz[i]);
    }
    int32_t *scans[4];
    for (int i = 0; i < 4; i++) {
        snprintf(nm, sizeof nm, "scan_%d.bin", i);
        scans[i] = (int32_t *)load(nm, NULL);
    }
    int32_t *sms[5];
    for (int i = 0; i < 5; i++) {
        snprintf(nm, sizeof nm, "sm_%d.bin", i);
        sms[i] = (int32_t *)load(nm, NULL);
    }
    double *fhs[7], *fws[7];
    for (int i = 0; i < 7; i++) {
        snprintf(nm, sizeof nm, "fh_%d.bin", i);
        fhs[i] = (double *)load(nm, NULL);
        snprintf(nm, sizeof nm, "fw_%d.bin", i);
        fws[i] = (double *)load(nm, NULL);
    }
    int32_t *dr = (int32_t *)load("dr.bin", NULL);
    int32_t *plan = NULL;
    if (plan_nbx > 0) plan = (int32_t *)load("plan.bin", NULL);

    size_t total = 0;
    for (int it = 0; it < iters; it++) {
        uint8_t *payload = NULL;
        size_t n = tile_encode(
            (const int32_t *const *)src, (int32_t *const *)recon, nplanes, w,
            h, bitdepth, speed, qindex, dq_dc, dq_ac, dq_ac_uv,
            (uint16_t *const *)cdfs, (const int32_t *const *)scans,
            (const int32_t *const *)sms, (const double *const *)fhs,
            (const double *const *)fws, dr, plan, plan_nbx, plan_nby,
            NULL, NULL, NULL, NULL, 0, &payload);
        total += n;
        tile_payload_free(payload);
        /* CDFs adapt in place - restore for identical work per iter */
        for (int i = 0; i < 24; i++)
            memcpy(cdfs[i], cdfs0[i], (size_t)cdf_sz[i]);
    }
    printf("payload bytes/iter: %zu\n", total / (size_t)iters);
    return 0;
}
"""


def main():
    img_name = sys.argv[1] if len(sys.argv) > 1 else "fractal"
    qindex = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    speed = int(os.environ.get("PROF_SPEED", "9"))

    import bench
    from oavif_tpu.av1.entropy import fast as F
    from oavif_tpu.av1.consts import coeff_q_ctx
    from oavif_tpu.av1.frame import CdfBank
    from oavif_tpu.av1.tables import TABLES, ac_q, dc_q
    from oavif_tpu.av1.transform import fwd_matrices
    from oavif_tpu.av1.yuv import rgb_to_yuv444

    img = getattr(bench, f"_img_{img_name}")(512, 512)
    planes = rgb_to_yuv444(img, bitdepth=8)
    h, w = planes[0].shape

    OUT.mkdir(exist_ok=True)
    for i, p in enumerate(planes):
        np.ascontiguousarray(p, dtype=np.int32).tofile(OUT / f"src_{i}.bin")

    bank = CdfBank(coeff_q_ctx(qindex))
    cdfs = {
        "part8": bank.partition[8], "part16": bank.partition[16],
        "part32": bank.partition[32], "part64": bank.partition[64],
        "skip": bank.skip, "kf_y": bank.kf_y, "uv_mode": bank.uv_mode,
        "uv_mode_cfl": bank.uv_mode_cfl, "angle_delta": bank.angle_delta,
        "txb_skip": bank.txb_skip,
        "eob16": bank.eob_pt[16], "eob64": bank.eob_pt[64],
        "eob256": bank.eob_pt[256], "eob1024": bank.eob_pt[1024],
        "eob_extra": bank.eob_extra, "coeff_base_eob": bank.coeff_base_eob,
        "coeff_base": bank.coeff_base, "coeff_br": bank.coeff_br,
        "dc_sign": bank.dc_sign,
        "cfl_sign": bank.cfl_sign, "cfl_alpha": bank.cfl_alpha,
        "intra_ext_tx1": bank.intra_ext_tx1,
        "intra_ext_tx2": bank.intra_ext_tx2, "tx_size": bank.tx_size,
    }
    for i, k in enumerate(F._CDF_ORDER):
        np.ascontiguousarray(cdfs[k], dtype=np.uint16).tofile(
            OUT / f"cdf_{i}.bin")
    for i, n in enumerate((4, 8, 16, 32)):
        np.ascontiguousarray(TABLES[f"scan_{n}x{n}"], dtype=np.int32).tofile(
            OUT / f"scan_{i}.bin")
    for i, n in enumerate((4, 8, 16, 32, 64)):
        np.ascontiguousarray(TABLES[f"sm_weights_{n}"], dtype=np.int32).tofile(
            OUT / f"sm_{i}.bin")
    fmats = [(n, tt) for n, tt in ((8, "dct_dct"), (16, "dct_dct"),
                                   (32, "dct_dct"), (64, "dct_dct"),
                                   (8, "adst_adst"), (16, "adst_adst"),
                                   (4, "dct_dct"))]
    for i, (n, tt) in enumerate(fmats):
        fh, fw = fwd_matrices(n, n, tt)
        np.ascontiguousarray(fh, dtype=np.float64).tofile(OUT / f"fh_{i}.bin")
        np.ascontiguousarray(fw, dtype=np.float64).tofile(OUT / f"fw_{i}.bin")
    np.ascontiguousarray(TABLES["dr_intra_derivative"], dtype=np.int32).tofile(
        OUT / "dr.bin")

    # device plan (the product path runs with one)
    plan_nbx = plan_nby = 0
    use_plan = os.environ.get("PROF_PLAN", "1") != "0"
    if use_plan:
        from oavif_tpu.av1.encode_tpu import FramePlanner

        plan = FramePlanner(planes, 8).plan(qindex)
        if plan is not None:
            sby, sbx = plan["plan64"].shape
            plan_nby, plan_nbx = plan["mode32"].shape
            arr = np.ascontiguousarray(np.concatenate([
                plan["plan64"].reshape(-1), plan["mode32"].reshape(-1),
                plan["part32"].reshape(-1), plan["mode16"].reshape(-1),
            ]).astype(np.int32))
            arr.tofile(OUT / "plan.bin")

    uv_dq = 0
    from oavif_tpu.av1.encode import _chroma_delta_q
    uv_dq = _chroma_delta_q(qindex, "iq", planes, 8)
    quv = min(max(qindex + uv_dq, 0), 255)
    (OUT / "meta.txt").write_text(
        f"{w} {h} {len(planes)} {qindex} {speed} "
        f"{int(dc_q(qindex, 8))} {int(ac_q(qindex, 8))} {int(ac_q(quv, 8))} "
        f"8 {plan_nbx} {plan_nby}\n")
    (OUT / "prof_main.c").write_text(PROF_MAIN)

    ent = Path("oavif_tpu/av1/entropy")
    subprocess.run(
        ["gcc", "-O3", "-march=native", "-pg",
         "--param", "vect-max-version-for-alias-checks=40",
         "-o", str(OUT / "prof_tile"), str(OUT / "prof_main.c"),
         str(ent / "oav1ec.c"), str(ent / "oav1tile.c"), "-lm"],
        check=True)
    print(f"built {OUT}/prof_tile  (image={img_name} q={qindex} "
          f"speed={speed} uv_dq={uv_dq} plan={plan_nbx}x{plan_nby})")


if __name__ == "__main__":
    main()
