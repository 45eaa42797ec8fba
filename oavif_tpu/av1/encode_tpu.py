"""Batched TPU encode planning (JAX).

The per-tile symbol coding is entropy-inherent serial (native C runtime),
but everything upstream of it is dense, batched math that belongs on the
MXU/VPU:

  - all-blocks × all-modes intra prediction from source edges
  - SSD mode scoring + argmin selection
  - forward DCT of the chosen residual as batched matmuls
  - quantization to integer levels

One jitted call plans every 32×32 block of the frame; the host tile coder
then emits symbols and reconstructs (recon prediction uses decoded
neighbors, which is bit-exactness-preserving: the bitstream's levels are
whatever the planner chose, and recon = pred_recon + inv(levels) on both
sides). Mode decisions from source edges instead of recon edges are the
standard encoder speed trade (enabled at speed >= 8).

Multi-chip: the block batch shards over the device mesh (tiles are the
AV1 parallel axis — SURVEY.md §2c); see __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tables import TABLES
from .transform import fwd_matrices

BLK = 32
N_MODES = 7  # DC, V, H, SMOOTH, SMOOTH_V, SMOOTH_H, PAETH
MODE_IDS = np.array([0, 1, 2, 9, 10, 11, 12])  # spec mode ids in that order


def _sm_weights(n: int) -> np.ndarray:
    return np.asarray(TABLES[f"sm_weights_{n}"], dtype=np.float32)


def _predict_all_modes(above, left, corner):
    """above: (n, BLK) float32; left: (n, BLK); corner: (n,).

    Returns (n, N_MODES, BLK, BLK) predictions (float32, integer-valued
    where it matters for decisions; exact integer recon happens host-side).
    """
    n = above.shape[0]
    a = above[:, None, :]  # (n, 1, w)
    l = left[:, :, None]  # (n, h, 1)
    c = corner[:, None, None]

    dc = (above.sum(-1) + left.sum(-1) + BLK) / (2 * BLK)
    dc = jnp.broadcast_to(dc[:, None, None], (n, BLK, BLK))
    v = jnp.broadcast_to(a, (n, BLK, BLK))
    h = jnp.broadcast_to(l, (n, BLK, BLK))

    base = a + l - c
    pa = jnp.abs(base - a)
    pl = jnp.abs(base - l)
    pc = jnp.abs(base - c)
    paeth = jnp.where(
        (pa <= pl) & (pa <= pc), jnp.broadcast_to(a, base.shape),
        jnp.where(pl <= pc, jnp.broadcast_to(l, base.shape), jnp.broadcast_to(c, base.shape)),
    )

    w = jnp.asarray(_sm_weights(BLK))
    below = left[:, -1][:, None, None]
    right = above[:, -1][:, None, None]
    wr = w[None, :, None]  # row weights
    wc = w[None, None, :]  # col weights
    smooth = jnp.round(
        (
            wr * a + (256.0 - wr) * below + wc * l + (256.0 - wc) * right + 256.0
        )
        / 512.0
    )
    smooth_v = jnp.round((wr * a + (256.0 - wr) * below + 128.0) / 256.0)
    smooth_h = jnp.round((wc * l + (256.0 - wc) * right + 128.0) / 256.0)

    return jnp.stack([dc, v, h, smooth, smooth_v, smooth_h, paeth], axis=1)


@functools.partial(jax.jit, static_argnames=("dq_shift",))
def plan_blocks(
    blocks: jnp.ndarray,  # (n, BLK, BLK) float32 source blocks
    above: jnp.ndarray,  # (n, BLK)
    left: jnp.ndarray,  # (n, BLK)
    corner: jnp.ndarray,  # (n,)
    fh: jnp.ndarray,  # (BLK, BLK) forward row matrix
    fw: jnp.ndarray,
    dq_dc: jnp.ndarray,  # scalar
    dq_ac: jnp.ndarray,
    dq_shift: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (best_mode_idx (n,), levels (n, BLK, BLK) int32)."""
    preds = _predict_all_modes(above, left, corner)
    err = preds - blocks[:, None]
    ssd = jnp.sum(err * err, axis=(2, 3))
    best = jnp.argmin(ssd, axis=1)
    pred = jnp.take_along_axis(preds, best[:, None, None, None], axis=1)[:, 0]
    resid = blocks - pred
    coeffs = jnp.einsum(
        "ij,njk,lk->nil", fh, resid, fw, precision=jax.lax.Precision.HIGHEST
    )
    qmat = jnp.full((BLK, BLK), dq_ac, dtype=jnp.float32)
    qmat = qmat.at[0, 0].set(dq_dc)
    scaled = coeffs * (1 << dq_shift) / qmat
    levels = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.35)
    return best, levels.astype(jnp.int32), pred


def plan_frame(y_plane: np.ndarray, qindex: int, bitdepth: int = 8):
    """Plan Y modes+levels for every full 32×32 block of the frame.

    Returns dict {(mi_r, mi_c): (mode_id, levels int32 (32,32))}.
    """
    from .tables import ac_q, dc_q
    from .frame import DQ_SHIFT

    h, w = y_plane.shape
    nby, nbx = h // BLK, w // BLK
    if nby == 0 or nbx == 0:
        return {}
    # 1px border filled with the decoder's unavailability values so frame
    # boundary blocks predict exactly like the decoder does (spec 7.11.2):
    # missing above row → 127s (or left[0] if left exists), missing left
    # col → 129s (or above[0]), missing corner → 128.
    base = 1 << (bitdepth - 1)
    p = np.empty((nby * BLK + 1, nbx * BLK + 1), dtype=np.float32)
    p[1:, 1:] = y_plane[: nby * BLK, : nbx * BLK]
    p[0, 1:] = base - 1
    p[1:, 0] = base + 1
    p[0, 0] = base
    blocks, above, left, corner = [], [], [], []
    for i in range(nby):
        for j in range(nbx):
            y0, x0 = 1 + i * BLK, 1 + j * BLK
            a = p[y0 - 1, x0 : x0 + BLK].copy()
            l = p[y0 : y0 + BLK, x0 - 1].copy()
            if i == 0 and j > 0:
                a[:] = l[0]  # above missing, left present → left[0]
            if j == 0 and i > 0:
                l[:] = a[0]  # left missing, above present → above[0]
            if i == 0 and j == 0:
                cnr = base
            elif i == 0:
                cnr = l[0]  # only left available → corner = left[0]
            elif j == 0:
                cnr = a[0]  # only above available → corner = above[0]
            else:
                cnr = p[y0 - 1, x0 - 1]
            blocks.append(p[y0 : y0 + BLK, x0 : x0 + BLK])
            above.append(a)
            left.append(l)
            corner.append(cnr)
    fh, fw = fwd_matrices(BLK, BLK)
    import os

    if os.environ.get("OAVIF_PALLAS") == "1":
        # Fused Pallas planner (predict+select+DCT+quant in VMEM). At the
        # current 32-lane block geometry XLA's fused einsum is measured
        # slightly faster, so the kernel is opt-in; kept as the template
        # for lane-packed variants.
        from .pallas_kernels import plan_blocks_pallas

        best, levels = plan_blocks_pallas(
            jnp.asarray(np.stack(blocks)),
            jnp.asarray(np.stack(above)),
            jnp.asarray(np.stack(left)),
            jnp.asarray(np.asarray(corner)),
            jnp.asarray(TABLES["sm_weights_32"], dtype=jnp.float32),
            jnp.asarray(fh, dtype=jnp.float32),
            jnp.asarray(fw, dtype=jnp.float32),
            jnp.asarray(
                [dc_q(qindex, bitdepth), ac_q(qindex, bitdepth),
                 1 << DQ_SHIFT[BLK]],
                dtype=jnp.float32,
            ),
            interpret=jax.default_backend() == "cpu",
        )
    else:
        best, levels, _ = plan_blocks(
            jnp.asarray(np.stack(blocks)),
            jnp.asarray(np.stack(above)),
            jnp.asarray(np.stack(left)),
            jnp.asarray(np.asarray(corner)),
            jnp.asarray(fh, dtype=jnp.float32),
            jnp.asarray(fw, dtype=jnp.float32),
            jnp.float32(dc_q(qindex, bitdepth)),
            jnp.float32(ac_q(qindex, bitdepth)),
            DQ_SHIFT[BLK],
        )
    best = np.asarray(best)
    levels = np.asarray(levels)
    out = {}
    k = 0
    for i in range(nby):
        for j in range(nbx):
            out[(i * 8, j * 8)] = (int(MODE_IDS[best[k]]), levels[k])
            k += 1
    return out
