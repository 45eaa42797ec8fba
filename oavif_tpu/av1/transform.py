"""AV1 integer transforms.

Inverse transforms are normative (spec 7.13): the decoder applies them to
dequantized coefficients, so the encoder's reconstruction must match them
bit-exactly — validated structurally against the float DCT-III here
(tests/test_transform.py) and end-to-end against the independent dav1d
decoder (tests/test_conformance.py).

The inverse DCT is implemented as the generic butterfly cascade the spec
uses for every size 4..64: an even half that recurses, and an odd half
(a DCT-IV network) built from one initial rotation stage followed by
alternating add/sub and rotation levels with a systematic angle schedule.
All rotations are Round2(a*cos128 ± b*sin128, 12) on integers.

Forward transforms are encoder freedom: any map producing good
coefficients is valid since recon always runs the normative inverse. We
derive the forward matrices numerically from the integer inverse (probe
unit vectors → linear map → scaled inverse), guaranteeing round trips land
near identity in the exact scale convention the decoder expects. The
forward path is pure matmuls — it runs batched on the TPU MXU
(oavif_tpu.av1.encode).
"""

from __future__ import annotations

import functools

import numpy as np

COS_BIT = 12


@functools.lru_cache(maxsize=None)
def cospi_table():
    i = np.arange(65)
    return np.round((1 << COS_BIT) * np.cos(i * np.pi / 128)).astype(np.int64)


def _round2(x, n):
    return (x + (1 << (n - 1))) >> n


def _hb(w0, x0, w1, x1):
    """half_btf: Round2(w0*x0 + w1*x1, 12) — integer butterfly rotation."""
    return _round2(w0 * x0 + w1 * x1, COS_BIT)


def brev(nbits: int, x: int) -> int:
    out = 0
    for i in range(nbits):
        out |= ((x >> i) & 1) << (nbits - 1 - i)
    return out


def _idct_odd(o, N):
    """Odd half (DCT-IV network) of the size-N inverse DCT.

    ``o`` is a list of h = N/2 arrays: o[j] = coefficient x[2j+1].
    Returns list of h arrays.
    """
    c = cospi_table()
    h = N // 2
    m = h.bit_length() - 1  # log2 h

    # Stage A: initial rotations, pairs (i, h-1-i), angle k*(64/N) with
    # k = 2*brev(m, i) + 1.
    s = [None] * h
    for i in range(h // 2):
        k = 2 * brev(m, i) + 1
        theta = k * (64 // N) * 2  # == k * (128 / N) ... careful below
        theta = k * (64 * 2 // N)  # k * 128/N: for N=16, k=1 → 8?? see note
        # Angle unit: cospi index = k * 64 / N ... for N=16, k=1 the known
        # angle is 4 (c60/c4). 64/N = 4. Use that.
        theta = k * (64 // N)
        a, b = o[(k - 1) // 2], o[(N - k - 1) // 2]
        s[i] = _hb(c[64 - theta], a, -c[theta], b)
        s[h - 1 - i] = _hb(c[theta], a, c[64 - theta], b)

    # Levels 1..m-1: add/sub stage then rotation stage.
    for L in range(1, m):
        g = 1 << L  # add/sub group size is 2^L ... pairs within group
        # --- add/sub: groups of size 2^L? No: groups of 2^L pairs → size
        # 2^L. Level 1 pairs adjacent (group 2), level 2 groups of 4, etc.
        gs = 1 << L
        t = list(s)
        for q in range(h // gs):
            base = q * gs
            for j in range(gs // 2):
                x, y = s[base + j], s[base + gs - 1 - j]
                if q % 2 == 0:
                    t[base + j] = x + y
                    t[base + gs - 1 - j] = x - y
                else:
                    t[base + j] = -x + y
                    t[base + gs - 1 - j] = x + y
        s = t
        # --- rotations: pairs (i, h-1-i) for i in the middle half of each
        # group of size 2^(L+1) (lower array half only).
        gr = 1 << (L + 1)
        t = list(s)
        unit = 64 >> (m - L)
        for i in range(h // 2):
            pos_in_group = i % gr
            if not (gr // 4 <= pos_in_group < 3 * gr // 4):
                continue
            q = i // gr
            theta = (2 * brev(max(m - L - 1, 0), q) + 1) * unit
            x, y = s[i], s[h - 1 - i]
            if pos_in_group < gr // 2:  # type +
                t[i] = _hb(-c[theta], x, c[64 - theta], y)
                t[h - 1 - i] = _hb(c[64 - theta], x, c[theta], y)
            else:  # type -
                t[i] = _hb(-c[64 - theta], x, -c[theta], y)
                t[h - 1 - i] = _hb(-c[theta], x, c[64 - theta], y)
        s = t
    return s


def idct_1d(x, N):
    """Size-N inverse DCT on natural-order coefficients.

    ``x`` is a list of N numpy arrays (vectorized over trailing dims).
    """
    c = cospi_table()
    if N == 2:
        s0 = _hb(c[32], x[0], c[32], x[1])
        s1 = _hb(c[32], x[0], -c[32], x[1])
        return [s0, s1]
    if N == 4:
        s0 = _hb(c[32], x[0], c[32], x[2])
        s1 = _hb(c[32], x[0], -c[32], x[2])
        s2 = _hb(c[48], x[1], -c[16], x[3])
        s3 = _hb(c[16], x[1], c[48], x[3])
        return [s0 + s3, s1 + s2, s1 - s2, s0 - s3]
    h = N // 2
    even = idct_1d([x[2 * i] for i in range(h)], h)
    odd = _idct_odd([x[2 * i + 1] for i in range(h)], N)
    out = [even[i] + odd[h - 1 - i] for i in range(h)]
    out += [even[h - 1 - i] - odd[i] for i in range(h)]
    return out


def iidentity_1d(x, N):
    """Identity transform scaling (spec 7.13.3: ×sqrt2 per odd log size)."""
    SQRT2 = 5793  # round(2^12 * sqrt(2))
    if N == 4:
        return [_round2(v * SQRT2, 12) for v in x]
    if N == 8:
        return [v * 2 for v in x]
    if N == 16:
        return [_round2(v * 2 * SQRT2, 12) for v in x]
    if N == 32:
        return [v * 4 for v in x]
    raise ValueError(N)


# ---------------------------------------------------------------------------
# 2D inverse transform (spec 7.13.3): rows then columns with shifts.
# ---------------------------------------------------------------------------

INV_SQRT2 = 2896  # round(2^12 / sqrt(2))

# Right-shift after the row (first) inverse pass, per max dimension
# (libaom inverse shift schedule; the column pass always shifts 4).
INV_ROW_SHIFT = {4: 0, 8: 1, 16: 2, 32: 2, 64: 2}


def inv_txfm2d(coeffs: np.ndarray, bitdepth: int = 8, tx_type: str = "dct_dct") -> np.ndarray:
    """Normative 2D inverse transform → residual (int array, h×w).

    ``coeffs`` is the dequantized coefficient array (h, w) in natural
    order, where h/w may be 64 with only the upper-left 32×32 nonzero.
    Dispatches to the native implementation when available (byte-identical;
    tests/test_transform.py cross-checks).
    """
    h, w = coeffs.shape
    if tx_type == "dct_dct":
        from .entropy.fast import inv_txfm2d_native

        out = inv_txfm2d_native(coeffs, bitdepth)
        if out is not None:
            return out
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    t = coeffs.astype(np.int64)

    # 64-point transforms only keep 32 coefficients per axis (zeroed here
    # by the caller's layout; enforce).
    if w == 64:
        t[:, 32:] = 0
    if h == 64:
        t[32:, :] = 0

    if abs(log2w - log2h) % 2 == 1:
        t = _round2(t * INV_SQRT2, 12)

    row_shift = INV_ROW_SHIFT[max(w, h)]
    col_shift = 4

    row_clamp = (1 << (bitdepth + 8 - 1)) - 1  # intermediate 16-bit for 8b

    # Row transforms (length w) on each row.
    cols_in = [t[:, i] for i in range(w)]
    rows_out = _apply_1d(cols_in, w, tx_type, horizontal=True)
    t = np.stack(rows_out, axis=1)
    t = _round2(t, row_shift) if row_shift else t
    t = np.clip(t, -row_clamp - 1, row_clamp)

    # Column transforms (length h).
    rows_in = [t[i, :] for i in range(h)]
    cols_out = _apply_1d(rows_in, h, tx_type, horizontal=False)
    t = np.stack(cols_out, axis=0)
    t = _round2(t, col_shift)
    return t


def _apply_1d(elems, N, tx_type, horizontal):
    if tx_type == "dct_dct":
        return idct_1d(elems, N)
    if tx_type == "idtx":
        return iidentity_1d(elems, N)
    raise NotImplementedError(tx_type)


# ---------------------------------------------------------------------------
# Forward transform: numerically derived from the integer inverse.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _inv_matrix_1d(N: int) -> np.ndarray:
    """Linearization of the integer inverse DCT (N×N float matrix)."""
    cols = []
    scale = 512  # probe amplitude well inside range, averages rounding
    for k in range(N):
        x = [np.zeros(1, np.int64) for _ in range(N)]
        x[k] = np.full(1, scale, np.int64)
        xm = [
            np.full(1, -scale, np.int64) if i == k else np.zeros(1, np.int64)
            for i in range(N)
        ]
        up = np.array([v[0] for v in idct_1d(x, N)], dtype=np.float64)
        dn = np.array([v[0] for v in idct_1d(xm, N)], dtype=np.float64)
        cols.append((up - dn) / (2 * scale))
    return np.stack(cols, axis=1)  # out = M @ coeffs


@functools.lru_cache(maxsize=None)
def fwd_matrices(w: int, h: int):
    """Forward 2D DCT matrices (Fh, Fw) such that
    coeffs ≈ Fh @ residual @ Fw.T lands where the normative inverse
    reproduces the residual: residual ≈ inv(coeffs)."""
    mw = _inv_matrix_1d(w)
    mh = _inv_matrix_1d(h)
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    row_shift = INV_ROW_SHIFT[max(w, h)]
    # inverse: res = round2(Mh @ (round2(Mw @ C^T, row_shift))^T, 4)
    #        = Mh @ C @ Mw^T / 2^(row_shift+4)    (as floats)
    # plus the rect sqrt2 pre-scale.
    pre = (INV_SQRT2 / 4096.0) if abs(log2w - log2h) % 2 == 1 else 1.0
    total = pre / (1 << (row_shift + 4))
    fh = np.linalg.inv(mh)
    fw = np.linalg.inv(mw)
    # res = total * Mh C Mw^T → C = (1/total) Mh^-1 res Mw^-T
    return fh / np.sqrt(total), fw / np.sqrt(total)


def fwd_txfm2d(residual: np.ndarray) -> np.ndarray:
    """Float forward transform matched to the normative inverse. The 64-pt
    high-frequency region is zeroed like the bitstream requires."""
    h, w = residual.shape
    fh, fw = fwd_matrices(w, h)
    c = fh @ residual.astype(np.float64) @ fw.T
    if w == 64:
        c[:, 32:] = 0
    if h == 64:
        c[32:, :] = 0
    return c


# ---------------------------------------------------------------------------
# Lossless 4x4 Walsh-Hadamard pair (spec 7.13.3 inverse WHT; the forward is
# its exact integer inverse — round-trip verified in tests/test_transform.py).
# ---------------------------------------------------------------------------


def inv_wht4x4(coeffs: np.ndarray) -> np.ndarray:
    """Normative lossless inverse WHT: input (4,4) int, output residual."""
    t = coeffs.astype(np.int64).copy()
    # rows (with the input >>2 on the first pass)
    for r in range(4):
        a, c, d, b = t[r, 0] >> 2, t[r, 1] >> 2, t[r, 2] >> 2, t[r, 3] >> 2
        a += c
        d -= b
        e = (a - d) >> 1
        b = e - b
        c = e - c
        a -= b
        d += c
        t[r] = [a, b, c, d]
    for cidx in range(4):
        a, c, d, b = t[0, cidx], t[1, cidx], t[2, cidx], t[3, cidx]
        a += c
        d -= b
        e = (a - d) >> 1
        b = e - b
        c = e - c
        a -= b
        d += c
        t[:, cidx] = [a, b, c, d]
    return t


def fwd_wht4x4(resid: np.ndarray) -> np.ndarray:
    """Forward WHT (libaom av1_fwht4x4 structure): produces coefficients
    whose normative inverse reproduces the residual exactly (x4 gain
    matching the >>2 on the inverse input)."""
    t = resid.astype(np.int64).copy()
    for cidx in range(4):
        a, b, c, d = t[0, cidx], t[1, cidx], t[2, cidx], t[3, cidx]
        a += b
        d -= c
        e = (a - d) >> 1
        b = e - b
        c = e - c
        a -= c
        d += b
        t[:, cidx] = [a, c, d, b]
    for r in range(4):
        a, b, c, d = t[r, 0], t[r, 1], t[r, 2], t[r, 3]
        a += b
        d -= c
        e = (a - d) >> 1
        b = e - b
        c = e - c
        a -= c
        d += b
        t[r] = [a, c, d, b]
    return t * 4
