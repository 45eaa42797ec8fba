/* SSIMULACRA 2.1 — native host implementation.
 *
 * Mirrors oavif_tpu/metric/ssimulacra2.py (the TPU/JAX implementation is
 * the reference; tests assert the two agree within epsilon). The native
 * path exists because the per-probe device metric call is latency-bound
 * through the tunneled single-chip setup (~50-100 ms RTT floor for a
 * ~10 ms compute); on the host the same math runs in ~15 ms at 512^2.
 * The JAX path remains the default for wide probe batches and multi-chip
 * meshes (SURVEY.md 2b N4), and is what the dryrun exercises.
 *
 * Reference behavior: fssimu2 computeSsimu2 (reference src/tq.zig:37).
 *
 * Pipeline (identical to the Python):
 *   sRGB8 -> linear RGB (LUT) -> per-scale (<=6, pre-downsample >=8px
 *   rule): 2x2 edge-replicated box downsample of LINEAR rgb, XYB
 *   (opsin cbrt) positive shift, Gaussian sigma=1.5 FIR radius 8
 *   (zero-padded borders), modified-SSIM + edge-ratio maps, 1- and
 *   4-norms, 108-weight dot, published final nonlinearity.
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#ifdef __AVX512F__
#include <immintrin.h>
#endif

#define SS2_RADIUS 8
#define SS2_TAPS (2 * SS2_RADIUS + 1)
#define SS2_MAXSCALES 6
static const double SS2_C2 = 0.0009;

/* SSIMULACRA 2.1 fitted weights, channel-major (X, Y, B) x scale0..5 x
 * [ssim_1, artifact_1, detail_1, ssim_4, artifact_4, detail_4] —
 * identical to ssimulacra2.py WEIGHTS. */
static const double SS2_W[108] = {
    0.0, 0.0007376606707406586, 0.0, 0.0, 0.0007793481682867309, 0.0,
    0.0, 0.0004371155730107379, 0.0, 1.1041726426657346,
    0.00066284834129271, 0.00015231632783718752,
    0.0, 0.0016406437456599754, 0.0, 1.8422455520539298,
    11.441172603757666, 0.0,
    0.0007989109436015163, 0.000176816438078653, 0.0, 1.8787594979546387,
    10.94906990605142, 0.0,
    0.0007289346991508072, 0.9677937080626833, 0.0,
    0.00014003424285435884, 0.9981766977854967, 0.00031949755934435053,
    0.0004550992113792063, 0.0, 0.0, 0.0013648766163243398, 0.0, 0.0,
    7.466890328078848, 0.0, 17.445833984131262, 0.0006235601634041466,
    0.0, 0.0,
    6.683678146179332, 0.00037724407979611296, 1.027889937768264,
    225.20515300849274, 0.0, 0.0,
    19.213238186143016, 0.0011401524586618361, 0.001237755635509985,
    176.39317598450694, 0.0, 0.0,
    24.43300999870476, 0.28520802612117757, 0.0004485436923833408, 0.0,
    0.0, 0.0,
    34.77906344483772, 44.835625328877896, 0.0, 0.0008680556573291698,
    0.0005313191874358747, 0.0,
    0.00016533814161379112, 0.0, 0.0, 0.0, 0.0, 0.0005895391724029294,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0004179171803251336, 0.0017290828234722833, 0.0,
    0.0020827005846636437, 0.0, 0.0,
    8.826982764996862, 23.19243343998926, 0.0, 95.1080498811086,
    0.9863978034400682, 0.9834382792465353,
    0.0012286405048278493, 171.2667255897307, 0.9807858872435379, 0.0,
    0.0, 0.0,
    0.0005130064588990679, 0.0, 0.00010854057858411537, 0.0, 0.0, 0.0,
};

/* Static sparsity of SS2_W, exploited to skip work EXACTLY (a feature
 * whose six weights are all zero contributes nothing to the dot; the
 * SSIM map is the only consumer of the s22/s12 blurs, so a block with
 * w[0]==w[3]==0 needs just the mu2 blur for its artifact/detail maps):
 *   - B channel, scales 0 and 1: all six weights zero -> skip entirely
 *     (that is 94% of the B channel's pixels);
 *   - X channel, scale 0: ssim_1 and ssim_4 weights zero -> skip the
 *     s22/s12 blurs and the td map at the most expensive scale.
 * Derived at init from the table itself, so a weight edit can't desync. */
static uint8_t SS2_NEED_ANY[3][SS2_MAXSCALES];
static uint8_t SS2_NEED_TD[3][SS2_MAXSCALES];
static uint8_t SS2_NEED_TA[3][SS2_MAXSCALES];
static uint8_t SS2_NEED_TL[3][SS2_MAXSCALES];

static const double SS2_FINAL_POW = 0.6276336467831387;
static const double SS2_FINAL_SCALE = 0.9562382616834844;
static const double SS2_CUBIC_A = 2.326765642916932;
static const double SS2_CUBIC_B = -0.020884521182843837;
static const double SS2_CUBIC_C = 6.248496625763138e-05;

static const float OPSIN_BIAS = 0.0037930732552754493f;
/* cbrt(OPSIN_BIAS) */
static const float CBRT_OPSIN_BIAS = 0.15595420054924863f;
static const float OPSIN_M[9] = {
    0.30f, 0.622f, 0.078f,
    0.23f, 0.692f, 0.078f,
    0.24342268924547819f, 0.20476744424496821f, 0.55180986650955360f,
};

/* ---- small helpers ---------------------------------------------------- */

static float SRGB_LUT[256];
static float GAUSS_K[SS2_TAPS];
static int ss2_inited = 0;

static void ss2_init(void) {
    if (ss2_inited) return;
    for (int i = 0; i < 256; i++) {
        double x = i / 255.0;
        SRGB_LUT[i] = (float)(x <= 0.04045 ? x / 12.92
                                           : pow((x + 0.055) / 1.055, 2.4));
    }
    double sum = 0.0, k[SS2_TAPS];
    for (int i = 0; i < SS2_TAPS; i++) {
        double t = (i - SS2_RADIUS) / 1.5;
        k[i] = exp(-0.5 * t * t);
        sum += k[i];
    }
    for (int i = 0; i < SS2_TAPS; i++) GAUSS_K[i] = (float)(k[i] / sum);
    for (int c = 0; c < 3; c++)
        for (int s = 0; s < SS2_MAXSCALES; s++) {
            const double *w = SS2_W + (c * 6 + s) * 6;
            SS2_NEED_TD[c][s] = w[0] != 0.0 || w[3] != 0.0;
            SS2_NEED_TA[c][s] = w[1] != 0.0 || w[4] != 0.0;
            SS2_NEED_TL[c][s] = w[2] != 0.0 || w[5] != 0.0;
            SS2_NEED_ANY[c][s] =
                SS2_NEED_TD[c][s] | SS2_NEED_TA[c][s] | SS2_NEED_TL[c][s];
        }
    ss2_inited = 1;
}

/* fast float cbrt for x >= 0 (bit-hack seed + 3 division-free Newton
 * steps on t = x^{-1/3}, then cbrt = x*t^2; rel err < 1e-6 — the score
 * needs ~1e-4). No divisions, so the whole xyb loop vectorizes to FMAs. */
static inline float fcbrtf(float x) {
    union { float f; uint32_t i; } u;
    u.f = x + 1e-35f; /* keep the exponent hack off denormals/zero */
    u.i = 0x54995300u - u.i / 3; /* tuned: max rel err 3.1e-7 on (1e-4,2.2) */
    float t = u.f; /* ~ x^{-1/3} */
    float x3 = x * (1.0f / 3.0f);
    t = t * (4.0f / 3.0f) - (x3 * t) * (t * t) * t;
    t = t * (4.0f / 3.0f) - (x3 * t) * (t * t) * t;
    t = t * (4.0f / 3.0f) - (x3 * t) * (t * t) * t;
    return x * t * t;
}

/* separable 17-tap Gaussian, zero-padded borders. tmp is w*h scratch.
 *
 * Both passes accumulate taps in ascending-k order PER OUTPUT ELEMENT, so
 * the fused AVX-512 sweep below is bit-identical to the scalar fallback
 * (and to the original 17-sweep saxpy formulation): only the iteration
 * shape changed, not any element's float op sequence. */
static void ss2_blur(const float *restrict in, float *restrict out,
                     float *restrict tmp, int w, int h) {
#ifdef __AVX512F__
    /* horizontal: one sweep, 16 outputs per vector, 17 fused fma */
    for (int y = 0; y < h; y++) {
        const float *r = in + (size_t)y * w;
        float *o = tmp + (size_t)y * w;
        int x = 0;
        /* left border (k-clamped), scalar */
        for (; x < SS2_RADIUS && x < w; x++) {
            float acc = 0.0f;
            int k0 = SS2_RADIUS - x;
            int k1 = (x + SS2_RADIUS < w) ? SS2_TAPS : SS2_TAPS - (x + SS2_RADIUS - w + 1);
            for (int k = k0; k < k1; k++) acc += GAUSS_K[k] * r[x + k - SS2_RADIUS];
            o[x] = acc;
        }
        /* interior: full tap range */
        int xe = w - SS2_RADIUS; /* last x with k1 == SS2_TAPS is xe-1 */
        for (; x + 16 <= xe; x += 16) {
            __m512 acc = _mm512_setzero_ps();
            const float *base = r + x - SS2_RADIUS;
            for (int k = 0; k < SS2_TAPS; k++)
                acc = _mm512_fmadd_ps(_mm512_set1_ps(GAUSS_K[k]),
                                      _mm512_loadu_ps(base + k), acc);
            _mm512_storeu_ps(o + x, acc);
        }
        for (; x < w; x++) {
            float acc = 0.0f;
            int k0 = x >= SS2_RADIUS ? 0 : SS2_RADIUS - x;
            int k1 = (x + SS2_RADIUS < w) ? SS2_TAPS : SS2_TAPS - (x + SS2_RADIUS - w + 1);
            for (int k = k0; k < k1; k++) acc += GAUSS_K[k] * r[x + k - SS2_RADIUS];
            o[x] = acc;
        }
    }
    /* vertical: one sweep down the rows, 16 columns per vector */
    for (int y = 0; y < h; y++) {
        float *o = out + (size_t)y * w;
        int k0 = y >= SS2_RADIUS ? 0 : SS2_RADIUS - y;
        int k1 = (y + SS2_RADIUS < h) ? SS2_TAPS : SS2_TAPS - (y + SS2_RADIUS - h + 1);
        const float *rbase = tmp + (size_t)(y - SS2_RADIUS) * w;
        int x = 0;
        for (; x + 16 <= w; x += 16) {
            __m512 acc = _mm512_setzero_ps();
            for (int k = k0; k < k1; k++)
                acc = _mm512_fmadd_ps(_mm512_set1_ps(GAUSS_K[k]),
                                      _mm512_loadu_ps(rbase + (size_t)k * w + x),
                                      acc);
            _mm512_storeu_ps(o + x, acc);
        }
        for (; x < w; x++) {
            float acc = 0.0f;
            for (int k = k0; k < k1; k++)
                acc += GAUSS_K[k] * rbase[(size_t)k * w + x];
            o[x] = acc;
        }
    }
#else
    /* horizontal */
    for (int y = 0; y < h; y++) {
        const float *r = in + (size_t)y * w;
        float *o = tmp + (size_t)y * w;
        memset(o, 0, (size_t)w * 4);
        for (int k = 0; k < SS2_TAPS; k++) {
            float c = GAUSS_K[k];
            int off = k - SS2_RADIUS;
            int x0 = off < 0 ? -off : 0;
            int x1 = off > 0 ? w - off : w;
            for (int x = x0; x < x1; x++) o[x] += c * r[x + off];
        }
    }
    /* vertical */
    memset(out, 0, (size_t)w * h * 4);
    for (int y = 0; y < h; y++) {
        float *o = out + (size_t)y * w;
        int k0 = y >= SS2_RADIUS ? 0 : SS2_RADIUS - y;
        int k1 = (y + SS2_RADIUS < h) ? SS2_TAPS : SS2_TAPS - (y + SS2_RADIUS - h + 1);
        for (int k = k0; k < k1; k++) {
            float c = GAUSS_K[k];
            const float *r = tmp + (size_t)(y + k - SS2_RADIUS) * w;
            for (int x = 0; x < w; x++) o[x] += c * r[x];
        }
    }
#endif
}

/* (h,w,3) u8 sRGB -> 3 planar linear float planes (each w*h) */
static void ss2_linearize(const uint8_t *rgb, int w, int h, float *lin) {
    size_t n = (size_t)w * h;
    for (size_t i = 0; i < n; i++) {
        lin[i] = SRGB_LUT[rgb[i * 3]];
        lin[n + i] = SRGB_LUT[rgb[i * 3 + 1]];
        lin[2 * n + i] = SRGB_LUT[rgb[i * 3 + 2]];
    }
}

/* 2x2 box downsample with edge replication; 3 planes in place-ish:
 * in 3*(w*h) -> out 3*(w2*h2) */
static void ss2_down2(const float *in, int w, int h, float *out) {
    int w2 = (w + 1) / 2, h2 = (h + 1) / 2;
    for (int c = 0; c < 3; c++) {
        const float *p = in + (size_t)c * w * h;
        float *o = out + (size_t)c * w2 * h2;
        for (int y = 0; y < h2; y++) {
            int y0 = 2 * y, y1 = 2 * y + 1 < h ? 2 * y + 1 : h - 1;
            const float *r0 = p + (size_t)y0 * w;
            const float *r1 = p + (size_t)y1 * w;
            for (int x = 0; x < w2; x++) {
                int x0 = 2 * x, x1 = 2 * x + 1 < w ? 2 * x + 1 : w - 1;
                o[y * w2 + x] =
                    0.25f * (r0[x0] + r0[x1] + r1[x0] + r1[x1]);
            }
        }
    }
}

/* 3 planar linear planes -> 3 planar positive-XYB planes (may alias).
 * with_b=0 skips the S cone + B plane (exact when the B channel's
 * weights are all zero at this scale — see SS2_NEED_ANY). */
static void ss2_xyb(const float *lin, int w, int h, float *xyb, int with_b) {
    size_t n = (size_t)w * h;
    const float *R = lin, *G = lin + n, *B = lin + 2 * n;
    float *X = xyb, *Y = xyb + n, *Bp = xyb + 2 * n;
    if (with_b) {
        for (size_t i = 0; i < n; i++) {
            float r = R[i], g = G[i], b = B[i];
            float l = OPSIN_M[0] * r + OPSIN_M[1] * g + OPSIN_M[2] * b + OPSIN_BIAS;
            float m = OPSIN_M[3] * r + OPSIN_M[4] * g + OPSIN_M[5] * b + OPSIN_BIAS;
            float s = OPSIN_M[6] * r + OPSIN_M[7] * g + OPSIN_M[8] * b + OPSIN_BIAS;
            l = fcbrtf(fmaxf(l, 0.f)) - CBRT_OPSIN_BIAS;
            m = fcbrtf(fmaxf(m, 0.f)) - CBRT_OPSIN_BIAS;
            s = fcbrtf(fmaxf(s, 0.f)) - CBRT_OPSIN_BIAS;
            float x = (l - m) * 0.5f;
            float y = (l + m) * 0.5f;
            X[i] = x * 14.0f + 0.42f;
            Y[i] = y + 0.01f;
            Bp[i] = (s - y) + 0.55f;
        }
    } else {
        for (size_t i = 0; i < n; i++) {
            float r = R[i], g = G[i], b = B[i];
            float l = OPSIN_M[0] * r + OPSIN_M[1] * g + OPSIN_M[2] * b + OPSIN_BIAS;
            float m = OPSIN_M[3] * r + OPSIN_M[4] * g + OPSIN_M[5] * b + OPSIN_BIAS;
            l = fcbrtf(fmaxf(l, 0.f)) - CBRT_OPSIN_BIAS;
            m = fcbrtf(fmaxf(m, 0.f)) - CBRT_OPSIN_BIAS;
            float x = (l - m) * 0.5f;
            float y = (l + m) * 0.5f;
            X[i] = x * 14.0f + 0.42f;
            Y[i] = y + 0.01f;
        }
    }
}

static int ss2_num_scales(int h, int w) {
    int n = 0;
    for (int s = 0; s < SS2_MAXSCALES; s++) {
        if (h < 8 || w < 8) break;
        if (s) { h = (h + 1) / 2; w = (w + 1) / 2; }
        n++;
    }
    return n;
}

/* ---- reference-side context ------------------------------------------ */

typedef struct {
    int w, h;
    float *img1; /* XYB, 3 planes */
    float *mu1;
    float *s11;
} Ss2Scale;

typedef struct Ssimu2Ref {
    int nsc, w0, h0;
    Ss2Scale sc[SS2_MAXSCALES];
} Ssimu2Ref;

void *ssimu2_ref_new(const uint8_t *rgb, int w, int h) {
    ss2_init();
    Ssimu2Ref *ctx = (Ssimu2Ref *)calloc(1, sizeof(Ssimu2Ref));
    ctx->w0 = w;
    ctx->h0 = h;
    ctx->nsc = ss2_num_scales(h, w);
    size_t n0 = (size_t)w * h;
    float *lin = (float *)malloc(3 * n0 * 4);
    float *lin2 = (float *)malloc(3 * n0 * 4);
    float *tmp = (float *)malloc(n0 * 4);
    float *sq = (float *)malloc(n0 * 4);
    ss2_linearize(rgb, w, h, lin);
    int cw = w, ch = h;
    for (int s = 0; s < ctx->nsc; s++) {
        if (s) {
            ss2_down2(lin, cw, ch, lin2);
            float *t = lin; lin = lin2; lin2 = t;
            cw = (cw + 1) / 2;
            ch = (ch + 1) / 2;
        }
        size_t n = (size_t)cw * ch;
        Ss2Scale *sc = &ctx->sc[s];
        sc->w = cw;
        sc->h = ch;
        sc->img1 = (float *)malloc(3 * n * 4);
        sc->mu1 = (float *)malloc(3 * n * 4);
        sc->s11 = (float *)malloc(3 * n * 4);
        ss2_xyb(lin, cw, ch, sc->img1, SS2_NEED_ANY[2][s]);
        for (int c = 0; c < 3; c++) {
            if (!SS2_NEED_ANY[c][s]) continue;
            const float *p = sc->img1 + (size_t)c * n;
            ss2_blur(p, sc->mu1 + (size_t)c * n, tmp, cw, ch);
            if (!SS2_NEED_TD[c][s]) continue;
            for (size_t i = 0; i < n; i++) sq[i] = p[i] * p[i];
            ss2_blur(sq, sc->s11 + (size_t)c * n, tmp, cw, ch);
        }
    }
    free(lin);
    free(lin2);
    free(tmp);
    free(sq);
    return ctx;
}

void ssimu2_ref_free(void *p) {
    Ssimu2Ref *ctx = (Ssimu2Ref *)p;
    if (!ctx) return;
    for (int s = 0; s < ctx->nsc; s++) {
        free(ctx->sc[s].img1);
        free(ctx->sc[s].mu1);
        free(ctx->sc[s].s11);
    }
    free(ctx);
}

double ssimu2_score(const void *pctx, const uint8_t *dist_rgb) {
    const Ssimu2Ref *ctx = (const Ssimu2Ref *)pctx;
    int w = ctx->w0, h = ctx->h0;
    size_t n0 = (size_t)w * h;
    float *lin = (float *)malloc(3 * n0 * 4);
    float *lin2 = (float *)malloc(3 * n0 * 4);
    float *img2 = (float *)malloc(3 * n0 * 4);
    float *mu2 = (float *)malloc(3 * n0 * 4);
    float *s22 = (float *)malloc(n0 * 4);
    float *s12 = (float *)malloc(n0 * 4);
    float *tmp = (float *)malloc(n0 * 4);
    float *sq = (float *)malloc(n0 * 4);
    float *td_buf = (float *)malloc(n0 * 4);
    float *ta_buf = (float *)malloc(n0 * 4);
    float *tl_buf = (float *)malloc(n0 * 4);
    /* feats[channel][scale][6]: ssim1, a1, l1, ssim4, a4, l4 */
    double feats[3][SS2_MAXSCALES][6];
    memset(feats, 0, sizeof feats);

    ss2_linearize(dist_rgb, w, h, lin);
    int cw = w, chh = h;
    for (int s = 0; s < ctx->nsc; s++) {
        if (s) {
            ss2_down2(lin, cw, chh, lin2);
            float *t = lin; lin = lin2; lin2 = t;
            cw = (cw + 1) / 2;
            chh = (chh + 1) / 2;
        }
        const Ss2Scale *sc = &ctx->sc[s];
        size_t n = (size_t)cw * chh;
        ss2_xyb(lin, cw, chh, img2, SS2_NEED_ANY[2][s]);
        for (int c = 0; c < 3; c++) {
            if (!SS2_NEED_ANY[c][s]) continue; /* zero-weighted: exact skip */
            int need_td = SS2_NEED_TD[c][s];
            int need_al = SS2_NEED_TA[c][s] || SS2_NEED_TL[c][s];
            const float *i1 = sc->img1 + (size_t)c * n;
            const float *m1 = sc->mu1 + (size_t)c * n;
            const float *v11 = sc->s11 + (size_t)c * n;
            const float *i2 = img2 + (size_t)c * n;
            float *m2 = mu2 + (size_t)c * n;
            ss2_blur(i2, m2, tmp, cw, chh);
            if (need_td) {
                for (size_t i = 0; i < n; i++) sq[i] = i2[i] * i2[i];
                ss2_blur(sq, s22, tmp, cw, chh);
                for (size_t i = 0; i < n; i++) sq[i] = i1[i] * i2[i];
                ss2_blur(sq, s12, tmp, cw, chh);
                for (size_t j = 0; j < n; j++) {
                    float mu1v = m1[j], mu2v = m2[j];
                    float mu11 = mu1v * mu1v, mu22 = mu2v * mu2v;
                    float mud = mu1v - mu2v;
                    float num_m = 1.0f - mud * mud;
                    float num_s =
                        2.0f * (s12[j] - mu1v * mu2v) + (float)SS2_C2;
                    float den_s =
                        (v11[j] - mu11) + (s22[j] - mu22) + (float)SS2_C2;
                    td_buf[j] = fmaxf(1.0f - (num_m * num_s) / den_s, 0.0f);
                }
            }
            if (need_al) {
                for (size_t j = 0; j < n; j++) {
                    float r = (1.0f + fabsf(i2[j] - m2[j])) /
                                  (1.0f + fabsf(i1[j] - m1[j])) -
                              1.0f;
                    ta_buf[j] = fmaxf(r, 0.0f);
                    tl_buf[j] = fmaxf(-r, 0.0f);
                }
            }
            /* 8-lane parallel double accumulators: deterministic (fixed
             * lane assignment) and vectorizable, unlike a serial FP
             * reduction the compiler must not reassociate. Each map's
             * accumulation order is identical to the original fused
             * loop's (per-accumulator adds in ascending j, same lanes). */
            double vd1[8] = {0}, vd4[8] = {0}, va1[8] = {0}, va4[8] = {0},
                   vl1[8] = {0}, vl4[8] = {0};
            size_t i8 = n & ~(size_t)7;
            if (need_td) {
                for (size_t i = 0; i < i8; i += 8)
                    for (int u = 0; u < 8; u++) {
                        double dd = td_buf[i + u], d2 = dd * dd;
                        vd1[u] += dd;
                        vd4[u] += d2 * d2;
                    }
                for (size_t j = i8; j < n; j++) {
                    double dd = td_buf[j], d2 = dd * dd;
                    vd1[0] += dd;
                    vd4[0] += d2 * d2;
                }
            }
            if (need_al) {
                for (size_t i = 0; i < i8; i += 8)
                    for (int u = 0; u < 8; u++) {
                        double a = ta_buf[i + u], a2 = a * a;
                        va1[u] += a;
                        va4[u] += a2 * a2;
                        double l = tl_buf[i + u], l2 = l * l;
                        vl1[u] += l;
                        vl4[u] += l2 * l2;
                    }
                for (size_t j = i8; j < n; j++) {
                    double a = ta_buf[j], a2 = a * a;
                    va1[0] += a;
                    va4[0] += a2 * a2;
                    double l = tl_buf[j], l2 = l * l;
                    vl1[0] += l;
                    vl4[0] += l2 * l2;
                }
            }
            double sd1 = 0, sd4 = 0, sa1 = 0, sa4 = 0, sl1 = 0, sl4 = 0;
            for (int u = 0; u < 8; u++) {
                sd1 += vd1[u];
                sd4 += vd4[u];
                sa1 += va1[u];
                sa4 += va4[u];
                sl1 += vl1[u];
                sl4 += vl4[u];
            }
            double inv = 1.0 / (double)n;
            feats[c][s][0] = sd1 * inv;
            feats[c][s][1] = sa1 * inv;
            feats[c][s][2] = sl1 * inv;
            feats[c][s][3] = sqrt(sqrt(sd4 * inv));
            feats[c][s][4] = sqrt(sqrt(sa4 * inv));
            feats[c][s][5] = sqrt(sqrt(sl4 * inv));
        }
    }
    free(lin);
    free(lin2);
    free(img2);
    free(mu2);
    free(s22);
    free(s12);
    free(tmp);
    free(sq);
    free(td_buf);
    free(ta_buf);
    free(tl_buf);

    double dot = 0.0;
    for (int c = 0; c < 3; c++)
        for (int s = 0; s < ctx->nsc; s++)
            for (int j = 0; j < 6; j++)
                dot += fabs(feats[c][s][j]) * SS2_W[(c * 6 + s) * 6 + j];
    double d = dot * SS2_FINAL_SCALE;
    d = SS2_CUBIC_A * d + SS2_CUBIC_B * d * d + SS2_CUBIC_C * d * d * d;
    if (d <= 0.0) return 100.0;
    return 100.0 - 10.0 * pow(d, SS2_FINAL_POW);
}

/* one-shot convenience (builds and frees the ref context) */
double ssimu2_compute(const uint8_t *ref_rgb, const uint8_t *dist_rgb,
                      int w, int h) {
    void *ctx = ssimu2_ref_new(ref_rgb, w, h);
    double s = ssimu2_score(ctx, dist_rgb);
    ssimu2_ref_free(ctx);
    return s;
}
