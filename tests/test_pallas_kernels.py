"""Pallas planner kernel semantics vs the pure-JAX reference
(interpret mode on the host platform, SURVEY.md §4d)."""

import jax.numpy as jnp
import numpy as np

from oavif_tpu.av1.encode_tpu import plan_blocks
from oavif_tpu.av1.pallas_kernels import plan_blocks_pallas
from oavif_tpu.av1.tables import TABLES
from oavif_tpu.av1.transform import fwd_matrices


def test_pallas_planner_matches_jax(rng):
    n = 11  # exercises GRP padding
    blocks = rng.integers(0, 256, (n, 32, 32)).astype(np.float32)
    above = rng.integers(0, 256, (n, 32)).astype(np.float32)
    left = rng.integers(0, 256, (n, 32)).astype(np.float32)
    corner = rng.integers(0, 256, (n,)).astype(np.float32)
    fh, fw = fwd_matrices(32, 32)
    smw = np.asarray(TABLES["sm_weights_32"], np.float32)
    dq = np.array([43.0, 37.0, 2.0], np.float32)

    best_p, lv_p = plan_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(above), jnp.asarray(left),
        jnp.asarray(corner), jnp.asarray(smw),
        jnp.asarray(fh, dtype=jnp.float32), jnp.asarray(fw, dtype=jnp.float32),
        jnp.asarray(dq), interpret=True)
    best_j, lv_j, _ = plan_blocks(
        jnp.asarray(blocks), jnp.asarray(above), jnp.asarray(left),
        jnp.asarray(corner), jnp.asarray(fh, dtype=jnp.float32),
        jnp.asarray(fw, dtype=jnp.float32), jnp.float32(43.0),
        jnp.float32(37.0), 1)

    np.testing.assert_array_equal(np.asarray(best_p), np.asarray(best_j))
    # levels may differ ±ε at quantization boundaries (different but valid
    # float accumulation orders); both feed the same normative inverse.
    d = np.abs(np.asarray(lv_p).astype(int) - np.asarray(lv_j).astype(int))
    assert d.max() <= 3 and (d > 0).mean() < 0.05
