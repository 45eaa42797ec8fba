"""Pallas TPU kernels for the encoder's batched planning path.

The planner evaluates every intra mode for every superblock, picks the SSD
argmin, forward-transforms the chosen residual, and quantizes — the dense
device half of the encode (oavif_tpu.av1.encode_tpu drives it; the C
runtime consumes the plan for symbol coding + recon).

The pure-JAX formulation materializes an (N, MODES, 32, 32) prediction
tensor in HBM between the predict and select stages. This kernel fuses the
whole pipeline per block-group inside VMEM: predictions are produced,
scored and discarded on-chip; only the chosen mode's levels ever leave the
core.

Mosaic layout strategy: everything in the kernel is strictly 2D (rank
changes and 3D dot_generals crash the vector layout inference on current
libtpu). A group of GRP blocks is stacked vertically — V[g*32+k, j] =
block[g][k, j] — so:
  - per-block scalar/row broadcasts become one matmul with a constant
    (GRP*32, GRP) block-indicator matrix E,
  - per-block reductions become one matmul with E^T,
  - the row DCT over all GRP blocks is one matmul with the block-diagonal
    (GRP*32, GRP*32) forward matrix, and the column DCT is a plain
    (GRP*32, 32) @ (32, 32) — both MXU-shaped.

Falls back to interpret mode off-TPU so tests exercise identical semantics
on the host platform (SURVEY.md §4d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 32
GRP = 8  # blocks per grid step
ROWS = GRP * BLK
N_MODES = 7  # DC, V, H, SMOOTH, SMOOTH_V, SMOOTH_H, PAETH (encode_tpu order)


def _np_expander():
    """E (ROWS, GRP): E[g*BLK+r, g'] = 1 if g == g'."""
    e = np.zeros((ROWS, GRP), np.float32)
    for g in range(GRP):
        e[g * BLK : (g + 1) * BLK, g] = 1.0
    return e


def _planner_kernel(v_ref, above_ref, lcol_ref, scal_ref, smr_ref, smc_ref,
                    e_ref, fhbd_ref, fw_ref, dq_ref, best_ref, levels_ref):
    """v_ref (ROWS, BLK) stacked blocks; above_ref (GRP, BLK);
    lcol_ref (ROWS, 1) stacked left columns; scal_ref (GRP, 4) =
    [corner, below, right, left_sum] per block; smr (1, BLK); smc (ROWS, 1)
    tiled smooth weights; e_ref (ROWS, GRP); fhbd_ref (ROWS, ROWS)
    block-diagonal row-DCT; fw_ref (BLK, BLK); dq scalars in SMEM."""
    blocks = v_ref[:, :]                      # (ROWS, BLK)
    above = above_ref[:, :]                   # (GRP, BLK)
    lcol = lcol_ref[:, :]                     # (ROWS, 1)
    e = e_ref[:, :]                           # (ROWS, GRP)

    def expand(x):  # (GRP, k) -> (ROWS, k) per-block broadcast
        return jnp.dot(e, x, preferred_element_type=jnp.float32)

    corner = expand(scal_ref[:, 0:1])         # (ROWS, 1)
    below = expand(scal_ref[:, 1:2])
    right = expand(scal_ref[:, 2:3])
    lsum = scal_ref[:, 3:4]                   # (GRP, 1)

    a_rows = expand(above)                    # (ROWS, BLK): above row per block

    asum = jnp.sum(above, axis=1, keepdims=True)            # (GRP, 1)
    dc_val = jnp.floor((asum + lsum + BLK) / (2 * BLK))
    dc = jnp.broadcast_to(expand(dc_val), (ROWS, BLK))

    v = a_rows
    h = jnp.broadcast_to(lcol, (ROWS, BLK))

    base = a_rows + lcol - corner
    pa = jnp.abs(base - a_rows)
    pb = jnp.abs(base - lcol)
    pc = jnp.abs(base - corner)
    paeth = jnp.where((pa <= pb) & (pa <= pc), v,
                      jnp.where(pb <= pc, h,
                                jnp.broadcast_to(corner, (ROWS, BLK))))

    wr = smc_ref[:, :]                        # (ROWS, 1): weight by row-in-block
    wc = smr_ref[:, :]                        # (1, BLK)
    smooth = jnp.floor(
        (wr * a_rows + (256.0 - wr) * below + wc * lcol
         + (256.0 - wc) * right + 256.0) / 512.0)
    smooth_v = jnp.floor((wr * a_rows + (256.0 - wr) * below + 128.0) / 256.0)
    smooth_h = jnp.floor((wc * lcol + (256.0 - wc) * right + 128.0) / 256.0)

    preds = (dc, v, h, smooth, smooth_v, smooth_h, paeth)
    ssds = []
    for p in preds:
        err2 = (p - blocks) * (p - blocks)
        rowsum = jnp.sum(err2, axis=1, keepdims=True)        # (ROWS, 1)
        ssds.append(jnp.dot(e.T, rowsum,
                            preferred_element_type=jnp.float32))  # (GRP, 1)

    best_ssd = ssds[0]
    best_idx = jnp.zeros((GRP, 1), jnp.int32)
    for m in range(1, N_MODES):
        better = ssds[m] < best_ssd
        best_idx = jnp.where(better, m, best_idx)
        best_ssd = jnp.where(better, ssds[m], best_ssd)
    best_ref[:, :] = best_idx

    pred = preds[0]
    for m in range(1, N_MODES):
        mask = expand(jnp.where(best_idx == m, 1.0, 0.0))    # (ROWS, 1)
        pred = jnp.where(mask > 0.5, preds[m], pred)

    resid = blocks - pred
    # row DCT for all blocks at once (block-diagonal), then column DCT
    t1 = jnp.dot(fhbd_ref[:, :], resid,
                 preferred_element_type=jnp.float32)         # (ROWS, BLK)
    coeffs = jnp.dot(t1, fw_ref[:, :].T,
                     preferred_element_type=jnp.float32)     # (ROWS, BLK)

    dq_dc = dq_ref[0, 0]
    dq_ac = dq_ref[0, 1]
    shift = dq_ref[0, 2]
    row_id = jax.lax.broadcasted_iota(jnp.int32, (ROWS, BLK), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (ROWS, BLK), 1)
    is_dc = (row_id % BLK == 0) & (col_id == 0)
    qmat = jnp.where(is_dc, dq_dc, dq_ac)
    scaled = coeffs * shift / qmat
    levels = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.35)
    levels_ref[:, :] = levels.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _plan_blocks_pallas_padded(v, above, lcol, scal, smr, smc, e, fhbd, fw,
                               dq, interpret=False):
    n = above.shape[0]
    best, levels = pl.pallas_call(
        _planner_kernel,
        grid=(n // GRP,),
        in_specs=[
            pl.BlockSpec((ROWS, BLK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP, BLK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GRP, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, GRP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ROWS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, BLK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((GRP, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, BLK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n * BLK, BLK), jnp.int32),
        ),
        interpret=interpret,
    )(v, above, lcol, scal, smr, smc, e, fhbd, fw, dq)
    return best, levels


def plan_blocks_pallas(blocks, above, left, corner, smw, fh, fw, dq,
                       interpret=False):
    """Fused planner over a batch of 32×32 blocks.

    blocks (n, 32, 32) f32; above/left (n, 32); corner (n,); smw (32,)
    smooth weights; fh/fw (32, 32) forward matrices; dq (3,) =
    [dq_dc, dq_ac, 1<<dq_shift] f32.
    Returns (best (n,) int32, levels (n, 32, 32) int32) — same semantics as
    oavif_tpu.av1.encode_tpu.plan_blocks.
    """
    n0 = blocks.shape[0]
    pad = (-n0) % GRP
    f32 = jnp.float32
    blocks = blocks.astype(f32)
    above = above.astype(f32)
    left = left.astype(f32)
    corner = corner.astype(f32)
    if pad:
        blocks = jnp.concatenate([blocks, jnp.zeros((pad, BLK, BLK), f32)])
        above = jnp.concatenate([above, jnp.zeros((pad, BLK), f32)])
        left = jnp.concatenate([left, jnp.zeros((pad, BLK), f32)])
        corner = jnp.concatenate([corner, jnp.zeros((pad,), f32)])
    n = n0 + pad

    v = blocks.reshape(n * BLK, BLK)
    lcol = left.reshape(n * BLK, 1)
    scal = jnp.stack(
        [corner, left[:, BLK - 1], above[:, BLK - 1],
         jnp.sum(left, axis=1)], axis=1)               # (n, 4)
    smr = smw.reshape(1, BLK).astype(f32)
    smc = jnp.tile(smw.reshape(BLK, 1).astype(f32), (GRP, 1))  # (ROWS, 1)
    e = jnp.asarray(_np_expander())
    fhbd = jnp.asarray(
        np.kron(np.eye(GRP, dtype=np.float32),
                np.asarray(fh, dtype=np.float32)))
    best, levels = _plan_blocks_pallas_padded(
        v, above, lcol, scal, smr, smc, e, fhbd, fw.astype(f32),
        dq.reshape(1, 3).astype(f32), interpret=interpret)
    return best[:n0, 0], levels.reshape(n, BLK, BLK)[:n0]


def planner_available() -> bool:
    return jax.default_backend() in ("tpu", "axon")
