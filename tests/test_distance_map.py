"""Distance-transform tests: exactness vs brute force, and Pallas-kernel
equivalence with the XLA stencil (the kernel runs in interpret mode on CPU
so its logic is covered without a chip)."""

import numpy as np
import pytest
import jax.numpy as jnp

from direct_stereo_slam_tpu.ops.distance_map import MAX_DIST, build_distance_map

pytestmark = pytest.mark.smoke


def _brute_force(pu, pv, mask, h2, w2):
    ui = np.clip(np.round(pu).astype(int), 0, w2 - 1)
    vi = np.clip(np.round(pv).astype(int), 0, h2 - 1)
    occ = np.zeros((h2, w2), bool)
    occ[vi[mask], ui[mask]] = True
    ys, xs = np.nonzero(occ)
    gy, gx = np.mgrid[0:h2, 0:w2]
    if len(ys) == 0:
        return np.full((h2, w2), float(MAX_DIST))
    # chebyshev distance to the nearest occupied cell, capped
    d = np.min(
        np.maximum(np.abs(gy[..., None] - ys), np.abs(gx[..., None] - xs)),
        axis=-1,
    )
    return np.minimum(d, MAX_DIST).astype(np.float32)


def test_matches_brute_force_chebyshev():
    rng = np.random.RandomState(3)
    h2, w2 = 40, 64
    n = 25
    pu = rng.rand(n).astype(np.float32) * (w2 - 1)
    pv = rng.rand(n).astype(np.float32) * (h2 - 1)
    mask = rng.rand(n) < 0.8
    out = np.asarray(build_distance_map(
        jnp.asarray(pu), jnp.asarray(pv), jnp.asarray(mask), h2, w2))
    ref = _brute_force(pu, pv, mask, h2, w2)
    np.testing.assert_array_equal(out, ref)


def test_empty_mask_is_all_max():
    h2, w2 = 16, 24
    out = np.asarray(build_distance_map(
        jnp.zeros(4), jnp.zeros(4), jnp.zeros(4, bool), h2, w2))
    assert np.all(out == MAX_DIST)


def test_pallas_kernel_matches_xla():
    rng = np.random.RandomState(0)
    h2, w2 = 48, 80
    n = 60
    pu = jnp.asarray(rng.rand(n).astype(np.float32) * (w2 - 1))
    pv = jnp.asarray(rng.rand(n).astype(np.float32) * (h2 - 1))
    mask = jnp.asarray(rng.rand(n) < 0.7)
    d_xla = build_distance_map(pu, pv, mask, h2, w2, False)
    d_pal = build_distance_map(pu, pv, mask, h2, w2, "interpret")
    np.testing.assert_array_equal(np.asarray(d_pal), np.asarray(d_xla))
