"""DSO-parity mode end-to-end: monocular bootstrap wired into the pipeline
(cfg.runtime.mono_initializer=True, scale_opt.accept_thres=-1 so the right
camera is NEVER used) — reference FrontEnd.cpp:607-623, 842-934.

The sequence starts with sideways motion (the well-posed mono-init
geometry), then proceeds forward with a small lateral component (a turning
car): PURE forward motion at this tiny resolution gives near-zero epipolar
parallax for new points, putting mono depth at a conditioning cliff where
last-ulp float changes (eager vs jitted pyramid fusion) flipped the
outcome. Because monocular odometry has arbitrary scale, drift is judged
on the Sim(3)-aligned (scale-corrected) trajectory, excluding the single
bootstrap-handoff frame (its pose is the initializer's two-frame estimate,
not BA-refined; it measured 5-10x the residual of every later frame).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.runtime.node import SLAMNode

W, H, LVLS = 320, 96, 4


@pytest.mark.slow
def test_mono_dso_mode_odometry():
    n_frames = 40
    ds = SyntheticStereoDataset(n_frames=n_frames, width=W, height=H, speed=0.0)
    poses = []
    T = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        poses.append(T.copy())
        T = T.copy()
        if i < 12:                       # sideways: init parallax
            T[0, 3] += 0.12
            T[2, 3] += 0.03
        else:                            # forward + slight lateral (turning)
            T[0, 3] += 0.04
            T[2, 3] += 0.1
    ds.poses = np.stack(poses)

    cfg = make_config(W, H)
    cfg = cfg.replace(
        tracker=cfg.tracker.__class__(pyr_levels=LVLS),
        ba=cfg.ba.__class__(max_frames=5, min_frames=3,
                            max_points_per_frame=128,
                            max_immature_per_frame=512,
                            desired_point_density=400.0,
                            desired_immature_density=300.0),
        scale_opt=cfg.scale_opt.__class__(accept_thres=-1.0),   # DSO mode
        runtime=cfg.runtime.__class__(mono_initializer=True),
    )
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                   W, H, LVLS)
    node = SLAMNode(cfg, intr, intr, ds.t_cam1_cam0)

    # to prove the right camera is unused in DSO mode, feed zeros for img1
    shells = []
    for i in range(n_frames):
        f = ds.frame(i)
        sh = node.process(f["img0"], jnp.zeros_like(f["img1"]),
                          timestamp=float(i) * 0.1)
        shells.append(sh)

    assert node.frontend.initialized, "mono bootstrap never initialized"
    assert not node.frontend.is_lost
    assert len(node.frontend.kf_shells) >= 3

    # tracked trajectory (every frame after init has a tracked pose)
    est, gt = [], []
    for i, sh in enumerate(shells):
        if sh.tracking_ref_kf >= 0 or sh.is_kf:
            est.append(np.asarray(sh.T_wc)[:3, 3])
            gt.append(ds.poses[i][:3, 3])
    est = np.stack(est)
    gt = np.stack(gt)
    # the bootstrap consumes the sideways prefix (snap + 5 confirm frames,
    # sometimes one restart); at least a dozen frames must be tracked
    assert len(est) >= 12
    # drop the bootstrap-handoff frame (see module docstring)
    est, gt = est[1:], gt[1:]

    # similarity alignment (mono scale is arbitrary): s, R, t via Umeyama
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E0, G0 = est - mu_e, gt - mu_g
    U, S, Vt = np.linalg.svd(G0.T @ E0)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    s = (S * np.diag(D)).sum() / max((E0 ** 2).sum(), 1e-12)
    resid = G0 - s * E0 @ R.T
    ate = np.sqrt((resid ** 2).sum(axis=1).mean())
    # bounded drift after Sim(3) alignment on a ~4 m path. Threshold has
    # measured margin: numerically-equivalent builds (eager vs jitted
    # pyramid, BA linearization reuse) land anywhere in 0.11-0.27 m on
    # this scenario — last-ulp fusion changes propagate through the
    # accept/reject heuristics — while genuine regressions (e.g. an
    # ill-conditioned init, wrong level selection) measured >= 0.5 m.
    assert ate < 0.35, f"mono DSO-mode ATE {ate:.3f} m"
