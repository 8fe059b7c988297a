"""Bootstrap initializer.

The reference uses DSO's monocular ``CoarseInitializer`` (setFirst/trackFrame
until "snapped", FrontEnd.cpp:607-623, 842-934) and pulls metric scale from
stereo later. This rebuild initializes *directly from the stereo pair*: the
pixel selector picks candidates in the left image, a full-length epipolar
trace against the right image (static stereo, known extrinsics) gives
metric inverse depths in one shot, and the surviving points become the
first keyframe's active points with an idepth prior — the same end state
the reference reaches at FrontEnd.cpp:879-908 (points with depth prior,
``hasDepthPrior=true``), but metric from frame 0 (so the stereo scale
optimizer converges to ~1 instead of pulling in an arbitrary mono scale).

A mono-compatible initializer (two-frame direct alignment) is a planned
round-2 addition for datasets without a usable second camera.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SLAMConfig
from ..geometry.camera import PyramidIntrinsics
from ..ops.pyramid import Pyramid
from ..ops.select import make_selection_map
from . import immature


class InitResult(NamedTuple):
    ok: bool
    u: Optional[jnp.ndarray]       # [K] selected pixels
    v: Optional[jnp.ndarray]
    idepth: Optional[jnp.ndarray]  # [K] metric inverse depth
    color: Optional[jnp.ndarray]   # [K, 8]
    weight: Optional[jnp.ndarray]  # [K, 8]
    valid: Optional[jnp.ndarray]   # [K] bool


def initialize_from_stereo(
    pyr0: Pyramid,
    pyr1: Pyramid,
    intr: PyramidIntrinsics,
    t_cam1_cam0: np.ndarray,
    cfg: SLAMConfig,
    budget: int,
    pot: int = 5,
    min_points: int = 50,
) -> InitResult:
    """Returns up to ``budget`` metric-depth points from one stereo pair."""
    K = np.asarray(intr.K(0), np.float32)
    sel, _ = make_selection_map(
        pyr0.abs_grad[0], pyr0.abs_grad[1], pyr0.abs_grad[2], pot, cfg
    )
    pts = immature.create_points(pyr0.data[0], sel, budget)

    KRKi = jnp.asarray(K @ t_cam1_cam0[:3, :3] @ np.linalg.inv(K), jnp.float32)
    Kt = jnp.asarray(K @ t_cam1_cam0[:3, 3], jnp.float32)
    # dense sample grid: the stereo search spans up to w/3 pixels, and far
    # points need sub-pixel disparity (idepth error ~ step_px / (fx * B))
    traced = immature.trace_points(
        pts, pyr1.data[0], KRKi, Kt, jnp.float32(1.0), jnp.float32(0.0), cfg,
        max_search_px=float(intr.w[0]) / 3.0, num_steps=256,
    )

    good = (
        np.asarray(traced.status) == immature.IPS_GOOD
    ) & np.asarray(traced.valid) & (np.asarray(traced.quality) > cfg.trace.min_trace_quality)
    idepth = 0.5 * (np.asarray(traced.idepth_min) + np.asarray(traced.idepth_max))
    good &= idepth > 1e-4

    if good.sum() < min_points:
        return InitResult(False, None, None, None, None, None, None)

    return InitResult(
        ok=True,
        u=traced.u,
        v=traced.v,
        idepth=jnp.asarray(idepth),
        color=traced.color,
        weight=traced.weight,
        valid=jnp.asarray(good),
    )
