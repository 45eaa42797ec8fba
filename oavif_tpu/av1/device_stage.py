"""Device-resident per-probe level computation (the batched encode stage).

This is the TPU-native answer to the reference encoder's per-probe
transform/quant work (the whole libaom encode runs inside
avifEncoderAddImage, reference src/io.zig:629-632): given the device
plan's per-block modes, ONE jitted call computes, for every 16x16 luma
block of the frame and for a BATCH of candidate quantizers, the
open-loop forward transform + quantized levels — the math the serial
host coder would otherwise redo per probe. The host then keeps only the
entropy-inherent work: symbol emission and exact recon (dequant +
normative integer inverse of the received levels — bit-exactness of the
shipped stream does not depend on how the levels were chosen).

Open-loop: residuals here are taken against SOURCE-edge predictions
(the planner's edges), while the decoder predicts from recon edges. The
coded stream stays conformant (levels are encoder freedom) at a small
quality cost where recon has drifted from source; the host consumer
guards each block with a prediction-delta check and falls back to its
exact closed-loop path when the drift is visible (device_levels_guard).

Economics (measured, PARITY.md): on a LOCAL TPU the per-probe fetch is
~1 ms and the stage removes ~45 ms/probe of host transform+quant; on
this workcell's remote-tunnel TPU (~25 MB/s, ~25 ms RTT) fetching one
frame of levels costs more than the whole host encode, so the product
enables the stage only when `calibrate()` measures the link fast enough
(OAVIF_DEVICE_LEVELS=1 forces on, =0 forces off, default auto).

The quantizer-batch axis is what re-arms batched speculative TQ passes
(BASELINE config 2): one device step serves a whole speculative round.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .encode_tpu import _grid_edges, _predict_modes
from .tables import TABLES


@functools.lru_cache(maxsize=None)
def _fwd_mats16():
    # cached as NUMPY (a cached jnp constant created under one trace
    # leaks into later traces)
    from .transform import fwd_matrices

    fh, fw = fwd_matrices(16, 16, "dct_dct")
    return (np.asarray(fh, np.float32), np.asarray(fw, np.float32))


@functools.lru_cache(maxsize=None)
def _scan_perm16():
    """(256, 256) 0/1 matrix: natural -> scan order as a matmul (static
    gathers are slow on TPU; a constant permutation matmul is MXU
    work). Cached as numpy — see _fwd_mats16."""
    scan = np.asarray(TABLES["scan_16x16"])
    p = np.zeros((256, 256), np.float32)
    p[np.arange(256), scan] = 1.0
    return p


def _coeffs_body(p, nby, nbx, modes16, bitdepth: int):
    """Per-source+plan stage: forward coefficients of every 16-block's
    open-loop residual under its PLANNED mode. Returns (n, 16, 16) f32."""
    p = p.astype(jnp.float32)  # planner planes are int16 on device
    base = jnp.float32(1 << (bitdepth - 1))
    blocks, above, left, corner = _grid_edges(p, nby, nbx, 16, base)
    preds = _predict_modes(above, left, corner, 16, 7)  # (n, 7, 16, 16)
    onehot = jax.nn.one_hot(modes16.reshape(-1), 7, dtype=jnp.float32)
    pred = jnp.einsum("nmhw,nm->nhw", preds, onehot)
    resid = blocks - pred
    fh, fw = _fwd_mats16()
    c = jnp.einsum("ij,njk->nik", fh, resid)
    return jnp.einsum("nik,lk->nil", c, fw)


def _quant_body(coeffs, dq_dc, dq_ac, shift: int):
    """Per-probe stage: round-half quantization of cached coefficients
    at one quantizer. dq_*: f32 scalars. Returns (n, 256) int16 levels
    (natural order) and (n,) int32 eob."""
    n = coeffs.shape[0]
    cf = coeffs.reshape(n, 256)
    dq = jnp.full((256,), dq_ac, jnp.float32).at[0].set(dq_dc)
    up = jnp.float32(1 << shift)
    mag = jnp.floor(jnp.abs(cf) * up / dq[None, :] + 0.5)
    lv = jnp.where(cf < 0, -mag, mag)
    lv = jnp.clip(lv, -16383, 16383)
    # eob in scan order via the constant permutation matmul
    sc_nz = (jnp.abs(lv) @ _scan_perm16().T > 0).astype(jnp.int32)
    idx = jnp.arange(1, 257, dtype=jnp.int32)[None, :]
    eob = jnp.max(sc_nz * idx, axis=1)
    return lv.astype(jnp.int16), eob


_coeffs_jit = jax.jit(_coeffs_body, static_argnames=("nby", "nbx", "bitdepth"))
_quant_batch = jax.jit(
    jax.vmap(_quant_body, in_axes=(None, 0, 0, None)),
    static_argnames=("shift",),
)


class DeviceLevels:
    """Holds the per-(source, plan) coefficient cache on device and
    serves per-probe (or probe-batch) level computation."""

    def __init__(self, planner, bitdepth: int = 8):
        self.planner = planner
        self.bitdepth = bitdepth
        self._coeff_key = None
        self._coeffs = None

    def _ensure_coeffs(self, modes16: np.ndarray):
        key = modes16.tobytes()
        if self._coeff_key == key:
            return
        pl = self.planner
        pnby, pnbx = pl.psby * 2, pl.psbx * 2
        self._coeffs = _coeffs_jit(
            pl.dev[0], pnby * 2, pnbx * 2,
            jnp.asarray(modes16, jnp.int32), self.bitdepth,
        )
        self._coeff_key = key

    def levels(self, modes16: np.ndarray, qindexes) -> tuple:
        """modes16: (2*pnby, 2*pnbx) planner-order mode INDICES (0..6);
        qindexes: iterable of qindex ints. Returns (levels (k, n, 256)
        int16 natural order, eob (k, n) int32) as numpy — ONE fetch."""
        from .tables import ac_q, dc_q

        self._ensure_coeffs(np.asarray(modes16, np.int32))
        qs = list(qindexes)
        dqd = jnp.asarray([float(dc_q(q, self.bitdepth)) for q in qs],
                          jnp.float32)
        dqa = jnp.asarray([float(ac_q(q, self.bitdepth)) for q in qs],
                          jnp.float32)
        lv, eob = _quant_batch(self._coeffs, dqd, dqa, 0)
        return np.asarray(lv), np.asarray(eob)


_CALIB: Optional[bool] = None


def device_levels_enabled(n_blocks: int = 1024) -> bool:
    """One-time calibration: is the device->host link fast enough that
    fetching a frame of levels beats recomputing them on the host?
    Threshold: the fetch must cost < 15 ms (the host transform+quant
    work it replaces is ~45 ms/frame; margin for the consume overhead).
    OAVIF_DEVICE_LEVELS=1/0 overrides."""
    global _CALIB
    # default OFF: the byte-identical C<->Python invariant holds only
    # when both coders make the same level choices, and the C runtime
    # does not consume device levels yet. "1" forces on, "auto" runs
    # the link calibration (the production-TPU default).
    env = os.environ.get("OAVIF_DEVICE_LEVELS", "0")
    if env == "1":
        return True
    if env == "0":
        return False
    if _CALIB is not None:
        return _CALIB
    try:
        x = jax.device_put(jnp.zeros((n_blocks, 256), jnp.int16))
        f = jax.jit(lambda a: a + 1)
        _ = np.asarray(f(x))  # compile + warm
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        dt = time.perf_counter() - t0
        _CALIB = dt < 0.015
    except Exception:
        _CALIB = False
    return _CALIB
