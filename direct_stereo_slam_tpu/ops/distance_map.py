"""Half-resolution distance transform for activation gating.

Equivalent of the reference's ``CoarseDistanceMap`` (BFS over projected
active points, TrackerAndScaler.cpp:1197-1334; consumed by activatePointsMT,
FrontEnd.cpp:431-445): active window points are projected into the newest
keyframe at half resolution, and candidate points are only activated where
the distance to the nearest existing point exceeds an adaptive threshold —
keeping the active set spatially uniform.

TPU-native: the BFS becomes K iterations of a 3x3 min-plus relaxation
(chebyshev-ish distance, capped at K — the gate only needs distances up to
``4 * my_type`` anyway, reference FrontEnd.cpp:442).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DIST = 16


def _relax_once(d: jnp.ndarray) -> jnp.ndarray:
    """One 3x3 min-plus (chebyshev) relaxation step with MAX_DIST borders.

    Separable: a 3x3 window min is a 3x1 row-min then a 1x3 column-min —
    4 shifted operands per iteration instead of 8. Shifts are built by
    slice+concat with a constant border row/column (no wrap-around)."""
    h, w = d.shape
    big_row = jnp.full((1, w), float(MAX_DIST), d.dtype)
    up = jnp.concatenate([d[1:], big_row], axis=0)
    down = jnp.concatenate([big_row, d[:-1]], axis=0)
    rowmin = jnp.minimum(d, jnp.minimum(up, down))
    big_col = jnp.full((h, 1), float(MAX_DIST), d.dtype)
    left = jnp.concatenate([rowmin[:, 1:], big_col], axis=1)
    right = jnp.concatenate([big_col, rowmin[:, :-1]], axis=1)
    winmin = jnp.minimum(rowmin, jnp.minimum(left, right))
    return jnp.minimum(d, winmin + 1.0)


def _dist_kernel(d0_ref, out_ref):
    """All MAX_DIST relaxation iterations fused in VMEM: the grid is read
    once and written once. (Measured: XLA fuses the equivalent fori_loop
    just as well on this grid size — see build_distance_map docstring.)"""
    d = d0_ref[...]
    for _ in range(MAX_DIST):
        d = _relax_once(d)
    out_ref[...] = d


@partial(jax.jit, static_argnums=(1, 2, 3))
def _distance_from_occupancy(dist0: jnp.ndarray, h2: int, w2: int,
                             use_pallas: bool) -> jnp.ndarray:
    if use_pallas:  # True on TPU; "interpret" exercises the kernel on CPU
        return pl.pallas_call(
            _dist_kernel,
            out_shape=jax.ShapeDtypeStruct((h2, w2), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=(use_pallas == "interpret"),
        )(dist0)
    return jax.lax.fori_loop(0, MAX_DIST, lambda _, d: _relax_once(d), dist0)


@partial(jax.jit, static_argnums=(3, 4, 5))
def build_distance_map(
    pu: jnp.ndarray,      # [N] projected pixel x at half resolution
    pv: jnp.ndarray,      # [N]
    mask: jnp.ndarray,    # [N] bool
    h2: int,
    w2: int,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Returns [h2, w2] float distance-to-nearest-occupied (capped).

    The scatter stays in XLA (Mosaic has no vectorized arbitrary scatter).
    Two stencil backends, measured on v5e at half-res KITTI (616x184,
    in-program, dispatch excluded): XLA fuses the whole fori_loop chain
    VMEM-resident at 1.1 us/transform; the explicit Pallas kernel runs
    3.0 us (its concat-based lane shifts lower to Mosaic relayouts that
    XLA's fused shift-iota code avoids). XLA is therefore the default;
    the Pallas kernel is kept as a verified variant and a template for
    stencils XLA fails to fuse."""
    if use_pallas is None:
        use_pallas = False
    ui = jnp.clip(jnp.round(pu).astype(jnp.int32), 0, w2 - 1)
    vi = jnp.clip(jnp.round(pv).astype(jnp.int32), 0, h2 - 1)
    occ = jnp.zeros((h2, w2), bool).at[vi, ui].max(mask)
    dist = jnp.where(occ, 0.0, float(MAX_DIST))
    return _distance_from_occupancy(dist, h2, w2, use_pallas)
