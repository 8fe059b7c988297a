"""Smoke-tier end-to-end: a tiny (96x48, 2-level, 64-point) odometry run
through the full SLAMNode path. Small shapes keep the cold compile budget
inside the smoke tier's 2-minute target; the full-size e2e lives in
test_frontend_e2e.py / test_full_slam.py (slow tier)."""

import numpy as np
import jax.numpy as jnp
import pytest

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.runtime.node import SLAMNode

pytestmark = pytest.mark.smoke

W, H, LVLS = 96, 48, 3


def test_smoke_odometry():
    ds = SyntheticStereoDataset(n_frames=12, width=W, height=H, speed=0.2)
    cfg = make_config(W, H)
    cfg = cfg.replace(
        tracker=cfg.tracker.__class__(pyr_levels=LVLS,
                                      max_iterations=(10, 20, 20)),
        ba=cfg.ba.__class__(max_frames=4, min_frames=3,
                            max_points_per_frame=64,
                            max_immature_per_frame=128,
                            desired_point_density=150.0,
                            desired_immature_density=100.0),
    )
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                   W, H, LVLS)
    node = SLAMNode(cfg, intr, intr, ds.t_cam1_cam0)
    shells = []
    for i in range(len(ds)):
        f = ds.frame(i)
        shells.append(node.process(f["img0"], f["img1"],
                                   timestamp=float(i) * 0.1))
    assert node.frontend.initialized
    assert not node.frontend.is_lost

    errs = []
    for i, sh in enumerate(shells):
        if sh.tracking_ref_kf >= 0 or sh.is_kf:
            errs.append(np.linalg.norm(
                np.asarray(sh.T_wc)[:3, 3] - ds.poses[i][:3, 3]))
    assert len(errs) >= 8
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.12, errs
