"""End-to-end visual odometry on a synthetic stereo sequence."""

import numpy as np
import jax.numpy as jnp

from direct_stereo_slam_tpu.config import make_config
from direct_stereo_slam_tpu.geometry import lie
from direct_stereo_slam_tpu.geometry.camera import make_pyramid_intrinsics
from direct_stereo_slam_tpu.io.synthetic import SyntheticStereoDataset
from direct_stereo_slam_tpu.models.frontend import FrontEnd

W, H, LVLS = 320, 96, 4


def run_sequence(n_frames=20, speed=0.35, yaw_rate=0.01):
    ds = SyntheticStereoDataset(
        n_frames=n_frames, width=W, height=H, speed=speed, yaw_rate=yaw_rate
    )
    cfg = make_config(W, H, preset=0, mode=1)
    cfg = cfg.replace(
        tracker=cfg.tracker.__class__(pyr_levels=LVLS),
        ba=cfg.ba.__class__(
            max_frames=5, min_frames=3,
            desired_point_density=600.0, desired_immature_density=450.0,
            max_points_per_frame=128, max_immature_per_frame=512,
        ),
    )
    K = ds.K
    intr = make_pyramid_intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2], W, H, LVLS)
    fe = FrontEnd(cfg, intr, intr, ds.t_cam1_cam0)

    shells = []
    for i, f in enumerate(ds):
        s = fe.add_stereo_frame(f["img0"], f["img1"], f["incoming_id"], f["timestamp"])
        shells.append((s, f["pose_w_c0"]))
        assert not fe.is_lost, f"lost at frame {i}"
        assert not fe.init_failed, f"init failed at frame {i}"
    return fe, shells, ds


def test_odometry_tracks_sequence():
    fe, shells, ds = run_sequence()
    assert fe.initialized
    assert fe.num_kfs >= 2

    # trajectory error: translation ATE against ground truth
    errs = []
    for s, T_gt in shells[1:]:
        errs.append(np.linalg.norm(s.T_wc[:3, 3] - T_gt[:3, 3]))
    errs = np.array(errs)
    total_dist = 0.35 * len(shells)
    ate = np.sqrt((errs**2).mean())
    # <2% of trajectory length on clean synthetic data
    assert ate < 0.02 * total_dist, (ate, total_dist, errs)


def test_keyframes_and_marginalization_happen():
    fe, shells, ds = run_sequence(n_frames=25, speed=0.45)
    assert fe.num_kfs >= 4
    active = int(np.asarray(jnp.sum(fe.ba_state.frame_valid)))
    assert active <= fe.cfg.ba.max_frames + 1
    # once the window is full, marginalized KFs must appear in the queue
    if fe.num_kfs > fe.cfg.ba.max_frames:
        assert len(fe.marginalized_queue) > 0
        mk = fe.marginalized_queue[0]
        assert np.isfinite(mk.dso_error)
        assert mk.kf_id >= 0


def test_marginalized_exports_full_level_colors():
    """Every exported point — including isOOB'd points whose host stayed
    in the window (the accumulator path) — must carry full per-level
    intensity signatures [K, LVLS], not the r4 center-color-only
    fallback; PoseEstimator samples all pyramid levels of these colors
    (LoopHandler.cpp:166-181)."""
    fe, shells, ds = run_sequence(n_frames=25, speed=0.45)
    assert len(fe.marginalized_queue) > 0
    saw_stay = fe.removal_stats.get("stay_export", 0)
    for mk in fe.marginalized_queue:
        if mk.pts_cam.shape[0] == 0:
            continue
        assert mk.pts_colors.shape == (mk.pts_cam.shape[0], LVLS), (
            mk.pts_colors.shape)
        assert np.isfinite(mk.pts_colors).all()
    # rule counters accumulate (host_leaving fires whenever a frame
    # marginalizes with surviving points)
    assert fe.removal_stats.get("host_leaving", 0) > 0, fe.removal_stats
    # if any stay-exports happened this run, the width assert above
    # proved they were full-level; record the count for visibility
    print("removal_stats:", fe.removal_stats, "stay_exports:", saw_stay)


def test_scale_stays_metric():
    """Stereo init gives metric scale; the scale optimizer should keep the
    accepted scale near 1 throughout."""
    fe, shells, ds = run_sequence(n_frames=22, speed=0.4)
    if fe.scale_state.trapped:
        # trapped means the optimizer accepted scales; the trajectory scale
        # must then be consistent with GT within a few percent
        d_est = np.linalg.norm(shells[-1][0].T_wc[:3, 3] - shells[0][0].T_wc[:3, 3])
        d_gt = np.linalg.norm(shells[-1][1][:3, 3] - shells[0][1][:3, 3])
        assert abs(d_est - d_gt) / d_gt < 0.05
