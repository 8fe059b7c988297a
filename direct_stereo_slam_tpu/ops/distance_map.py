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

MAX_DIST = 16


@partial(jax.jit, static_argnums=(3, 4))
def build_distance_map(
    pu: jnp.ndarray,      # [N] projected pixel x at half resolution
    pv: jnp.ndarray,      # [N]
    mask: jnp.ndarray,    # [N] bool
    h2: int,
    w2: int,
) -> jnp.ndarray:
    """Returns [h2, w2] float distance-to-nearest-occupied (capped)."""
    ui = jnp.clip(jnp.round(pu).astype(jnp.int32), 0, w2 - 1)
    vi = jnp.clip(jnp.round(pv).astype(jnp.int32), 0, h2 - 1)
    occ = jnp.zeros((h2, w2), bool).at[vi, ui].max(mask)
    dist = jnp.where(occ, 0.0, float(MAX_DIST))

    def relax(_, d):
        dp = jnp.pad(d, 1, constant_values=float(MAX_DIST))
        best = d
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                best = jnp.minimum(best, dp[1 + dy : 1 + dy + d.shape[0],
                                            1 + dx : 1 + dx + d.shape[1]] + 1.0)
        return best

    return jax.lax.fori_loop(0, MAX_DIST, relax, dist)
